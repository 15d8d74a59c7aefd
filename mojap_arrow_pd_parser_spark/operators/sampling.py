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
