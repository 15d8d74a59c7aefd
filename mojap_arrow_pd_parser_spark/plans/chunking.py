"""Chunk planning: deterministic range partitioning on the sort key (N11).

``repartitionByRange`` alone is not resumable: its sampled boundaries
change run-to-run, so chunk identity would drift. We do what it does —
sample the key, cut quantile boundaries — but persist the boundaries in
``plan.json`` on the first run and reuse them on every subsequent run,
making chunk ids stable across restarts and parallelism levels
(SURVEY.md §2.6 N11 + N13).

Bucket assignment is a pure JVM fold over the literal boundary array
(whole-stage codegen; no Python in the path). At 1000-executor scale
this is one narrow map stage; the only shuffle is the subsequent
hash-repartition on the bucket id, which is exactly the shuffle a range
partitioner would do.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PLAN_FILE = "plan.json"
_SAMPLE_TARGET = 100_000


def make_plan(
    df: DataFrame,
    key: str,
    n_chunks: int,
    seed: int = 42,
    partition_cols: list[str] | None = None,
) -> dict:
    """Sample ``key`` and cut ``n_chunks`` quantile boundaries."""
    n_rows = df.count()
    if n_rows == 0:
        boundaries: list = []
    else:
        frac = min(1.0, _SAMPLE_TARGET / max(n_rows, 1))
        sample = (
            df.select(key).sample(fraction=frac, seed=seed).toPandas()[key].tolist()
        )
        if not sample:
            sample = [r[0] for r in df.select(key).limit(1000).collect()]
        sample.sort()
        cuts = [
            sample[int(len(sample) * i / n_chunks)]
            for i in range(1, n_chunks)
        ]
        # dedupe while preserving order (low-cardinality keys)
        boundaries = sorted(set(cuts))
    return {
        "version": 1,
        "key": key,
        "n_chunks": len(boundaries) + 1,
        "boundaries": boundaries,
        "n_rows": n_rows,
        "seed": seed,
        "partition_cols": partition_cols or [],
    }


def make_partitioned_plan(
    df: DataFrame,
    key: str,
    partition_col: str,
    n_chunks: int,
    seed: int = 42,
) -> dict:
    """Partition-by-``partition_col`` plan with EXPLICIT skew salting
    (SURVEY N10 / north rule "salting of skewed source partitions").

    Each partition value gets a number of salts proportional to its row
    count — a 70%-hot ``source`` value is split across ~70% of the
    chunk budget instead of stalling one straggler task. Chunk id =
    dense offset(partition) + hash(key) % salts(partition); the salt
    map persists in the plan so chunk identity stays stable for resume.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(partition_col).count().collect()
    }
    total = sum(counts.values()) or 1
    salts: dict = {}
    for val, cnt in sorted(counts.items(), key=lambda kv: str(kv[0])):
        salts[val] = max(1, round(n_chunks * cnt / total))
    offsets: dict = {}
    base = 0
    for val in salts:
        offsets[val] = base
        base += salts[val]
    return {
        "version": 1,
        "mode": "partition_salt",
        "key": key,
        "partition_col": partition_col,
        "salts": salts,
        "offsets": offsets,
        "n_chunks": base + 1,  # +1: overflow bucket for unseen values
        "overflow_bucket": base,
        "n_rows": total,
        "seed": seed,
        "boundaries": [],
    }


def load_or_make_plan(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    key: str,
    n_chunks: int,
    seed: int = 42,
    partition_col: str | None = None,
) -> dict:
    path = os.path.join(out_dir, PLAN_FILE)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    if partition_col:
        plan = make_partitioned_plan(df, key, partition_col, n_chunks, seed=seed)
    else:
        plan = make_plan(df, key, n_chunks, seed=seed)
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(plan, f)
    os.replace(tmp, path)
    return plan


def assign_buckets(df: DataFrame, plan: dict, col_name: str = "_bucket") -> DataFrame:
    """Add the deterministic range-bucket id column.

    bucket = |{ b in boundaries : key >= b }| — searchsorted(side=right)
    as a pure JVM fold over a literal boundary array (codegen'd; ~4x
    faster than a pandas UDF and keeps the stage whole-codegen).
    """
    if plan.get("mode") == "partition_salt":
        p = plan["partition_col"]
        key = plan["key"]
        salt_entries = []
        off_entries = []
        for val, n in plan["salts"].items():
            salt_entries += [F.lit(val), F.lit(n)]
            off_entries += [F.lit(val), F.lit(plan["offsets"][val])]
        salts_map = F.create_map(*salt_entries)
        offs_map = F.create_map(*off_entries)
        bucket = offs_map[F.col(p)] + F.pmod(
            F.xxhash64(F.col(key)), salts_map[F.col(p)]
        )
        # partition values unseen at plan time land in the overflow bucket
        bucket = F.coalesce(bucket, F.lit(plan["overflow_bucket"]))
        return df.withColumn(col_name, bucket.cast("int"))
    boundaries = plan["boundaries"]
    key = plan["key"]
    if not boundaries:
        return df.withColumn(col_name, F.lit(0))
    barr = F.array(*[F.lit(b) for b in boundaries])
    bucket = F.aggregate(
        barr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(key) >= b, 1).otherwise(0),
    )
    return df.withColumn(col_name, bucket.cast("int"))


def salt_skewed(
    df: DataFrame,
    key: str,
    n_salts: int = 16,
    hot_keys: list | None = None,
    salt_col: str = "_salt",
) -> DataFrame:
    """Explicit skew salting (N10): hot keys get ``n_salts`` sub-keys.

    Downstream groupBys aggregate on (key, salt) then re-aggregate on
    key — two small shuffles instead of one stalled straggler. When
    ``hot_keys`` is None every key is salted (uniform salting).
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    if hot_keys is None:
        return df.withColumn(salt_col, salt.cast("int"))
    is_hot = F.col(key).isin(list(hot_keys))
    return df.withColumn(
        salt_col, F.when(is_hot, salt.cast("int")).otherwise(F.lit(0))
    )
