"""Deterministic sampling operators for training-data curation.

Two strategies, both seedless-deterministic (pure functions of the
row's id, so re-runs and resumed jobs pick identical samples — the
property the engine's checkpoint/resume semantics rely on):

* ``stratified_sample`` — EXACT n per stratum, selected by a
  hash-order row_number window. The per-stratum sort is the cost: at
  100 TB with few huge strata the window's sort dominates, so use it
  when per-stratum counts must be exact (eval-set carving, balanced
  fine-tune mixes).
* ``hash_sample`` — approximate fraction via a pure hash threshold on
  the id (same family as the train/val split, packing.py): a narrow
  map with NO shuffle at all; per-stratum counts are binomial around
  frac*N. This is the 100-TB default; the exact variant is for when
  the count contract matters more than the extra exchange.

(The reference has no sampling operators; this extends the
training-pipeline suite alongside dedup/packing/contamination.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``min(n, stratum_size)`` rows per stratum, chosen by
    md5-hash order of the id (engine-portable: any SQL engine computes
    the same md5, so the selection is reproducible cross-engine).

    The returned ``sample_rank`` (1-based hash-order rank within the
    stratum) makes nested subsamples free: ``sample_rank <= m`` for
    any m <= n is itself the m-per-stratum sample.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def hash_sample(
    df: DataFrame,
    frac: float,
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Approximate ``frac`` sample as a pure filter on
    ``pmod(xxhash64(id), buckets) < frac*buckets`` — zero shuffle,
    deterministic, disjoint for disjoint threshold ranges (so
    train/holdout carving composes with it).
    """
    cut = int(round(frac * buckets))
    return df.filter(
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(buckets)) < cut
    )


def mixture_resample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic mixture resampling with UPSAMPLING — the
    data-recipe operator (Pile / LLaMA style: "wikipedia x3.5,
    common_crawl x0.67"): each row is emitted ``floor(rate)`` times
    plus one more iff its id-hash bucket falls under the fractional
    part. Rates > 1 replicate (the ``epoch`` column, 1-based,
    distinguishes copies so downstream shuffling/packing can interleave
    them); rates in [0, 1) downsample with the same deterministic
    hash-bucket semantics as ``hash_sample`` (but on the portable
    28-bit md5 prefix rather than xxhash64, so the selected row sets
    differ between the two operators for the same rate); sources
    absent from ``rates`` get ``default_rate``.

    Everything is a pure function of (id, source): re-runs, resumed
    jobs and different cluster sizes produce the identical multiset —
    and the hash is the engine-portable 28-bit md5 prefix, so an
    independent SQL engine reproduces the sample row-for-row.

    100-TB shape: one narrow scan, zero shuffle — the rate map rides
    the plan as a literal map, replication is sequence+explode (rows
    expand in place, no join), and the fractional draw reuses the
    row's own hash, so no RNG state exists anywhere.
    """
    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("rates must be >= 0")
    pairs = []
    for k, v in rates.items():
        pairs.extend([F.lit(k), F.lit(float(v))])
    rate = (
        F.coalesce(
            F.element_at(F.create_map(*pairs), F.col(source_col)),
            F.lit(float(default_rate)),
        )
        if pairs
        else F.lit(float(default_rate))
    )
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10
    ).cast("long")
    u = F.pmod(h, F.lit(buckets))  # uniform over [0, buckets)
    whole = F.floor(rate).cast("int")
    frac_cut = F.round((rate - F.floor(rate)) * buckets).cast("long")
    copies = whole + F.when(u < frac_cut, 1).otherwise(0)
    seq = F.when(copies >= 1, F.sequence(F.lit(1), copies)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("epoch", F.explode(seq))
