"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
# Python workers spawned by Spark must import the package too.
_pp = os.environ.get("PYTHONPATH", "")
if REPO_ROOT not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = REPO_ROOT + (os.pathsep + _pp if _pp else "")

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode the sf0.001 documents table with the columnar
    engine, decode it back, and report per-row verification — the
    round-trip invariant (decode(encode(x)) == x) that generalizes the
    reference's read-in == write-out guarantee."""
    import tempfile

    from pyspark.sql import functions as F

    from mojap_arrow_pd_parser_spark.operators.decode import decode_table
    from mojap_arrow_pd_parser_spark.operators.encode import encode_table

    src = spark.read.parquet(f"{SF0001}/documents.parquet")
    out = tempfile.mkdtemp(prefix="entry_enc_")
    manifest = encode_table(spark, src, out, key="doc_id", n_chunks=4)
    dec = decode_table(spark, out)
    cmp_cols = [c for c in src.columns if c != "doc_id"]
    j = src.alias("o").join(dec.alias("d"), "doc_id")
    ok = None
    for c in cmp_cols:
        e = F.col(f"o.{c}").eqNullSafe(F.col(f"d.{c}"))
        ok = e if ok is None else (ok & e)
    verified = j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(ok, 0).otherwise(1)).alias("mismatches"),
    )
    return manifest.select(
        "chunk_id", "n_rows", "n_cols", "in_bytes", "out_bytes", "codecs", "status"
    ).crossJoin(verified.select(F.col("mismatches").alias("rt_mismatches")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mojap_arrow_pd_parser_spark.queries import QUERIES

    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from mojap_arrow_pd_parser_spark.queries import QUERIES

    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
