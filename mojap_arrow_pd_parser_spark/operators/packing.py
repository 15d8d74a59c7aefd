"""Training-sequence packing + token statistics over the tokens table.

The standard LLM pretraining dataloader concatenates the token stream
in a deterministic document order and splits it into fixed-length
training sequences (documents straddle sequence boundaries). These
operators produce that packed view — and corpus-level token
statistics — as pure DataFrame programs.

Scale notes (the part worth engineering):

* The global token offset of each document is NOT computed with a
  global ``Window.orderBy`` (which Spark executes as a sort into one
  reducer — a single-task bottleneck at 100 TB). Instead the engine's
  deterministic range-bucket planner assigns each doc a bucket, the
  per-bucket token totals (one tiny aggregate, ``n_buckets`` rows)
  prefix-sum over a window on that aggregate alone and broadcast-join
  back, and the within-bucket offset is a window partitioned BY
  bucket — distributed on every side, nothing O(n_buckets) in the
  plan or on the driver.
* No token is ever exploded on the Spark side: each document
  contributes at most ``spanned sequences`` array slices (JVM
  ``slice``/``sequence`` expressions), and sequences are assembled
  with one hash shuffle on ``seq_id``.
* ``token_vocab`` does explode, but that is the canonical shape for a
  vocabulary histogram — partial aggregation (map-side combine) makes
  it one narrow shuffle of (token, count) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def doc_offsets(
    spark: SparkSession,
    df: DataFrame,
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    n_buckets: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Global token-stream offset per document (exclusive prefix sum of
    ``n_tok`` in ``id_col`` order), without a single-reducer sort.

    bucket prefix + within-bucket window = exact global offsets. The
    per-bucket totals are one tiny aggregate (``n_buckets`` rows);
    their exclusive prefix sum is a window over THAT aggregate (its
    single-reducer sort touches only n_buckets rows), and the result
    joins back with a broadcast — so nothing scales with n_buckets on
    the driver or in the plan (no ``create_map`` literal: at the ~400k
    buckets a 100-TB stream needs, a literal lookup would be megabytes
    of query plan shipped to every task).
    """
    from ..plans.chunking import assign_buckets, make_plan

    plan = make_plan(df, id_col, n_buckets, seed=seed)
    b = assign_buckets(df, plan)
    totals = b.groupBy("_bucket").agg(
        F.coalesce(F.sum(n_tok_col), F.lit(0)).alias("_t")
    )
    pw = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.select(
        "_bucket",
        F.coalesce(F.sum("_t").over(pw), F.lit(0)).cast("long").alias("_prefix"),
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(n_tok_col).over(w), F.lit(0))
    return (
        b.join(F.broadcast(prefix), "_bucket")
        .withColumn("tok_start", (F.col("_prefix") + local).cast("long"))
        .drop("_bucket", "_prefix")
    )


def pack_sequences(
    spark: SparkSession,
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    n_buckets: int = 64,
) -> DataFrame:
    """Concat-and-split packing: the token stream in ``id_col`` order,
    cut into sequences of exactly ``seq_len`` tokens (last one ragged).

    Returns (seq_id, tokens, n_tokens, n_docs): ``n_docs`` = number of
    documents contributing at least one token to the sequence. Every
    document becomes at most ceil(n_tok/seq_len)+1 array SLICES (pure
    JVM expressions — no token explode, no UDF), assembled per
    sequence with one hash shuffle on seq_id.
    """
    offs = doc_offsets(spark, df, id_col, n_tok_col, n_buckets).filter(
        F.col(n_tok_col) > 0
    )
    first_seq = F.floor(F.col("tok_start") / seq_len)
    last_seq = F.floor((F.col("tok_start") + F.col(n_tok_col) - 1) / seq_len)
    seg = offs.select(
        F.col(id_col),
        F.col(tokens_col),
        F.col(n_tok_col),
        F.col("tok_start"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    # slice bounds of this doc's contribution to this sequence
    seg_start = F.greatest(F.col("seq_id") * seq_len - F.col("tok_start"), F.lit(0))
    seg_end = F.least(
        (F.col("seq_id") + 1) * seq_len - F.col("tok_start"), F.col(n_tok_col)
    )
    seg = seg.select(
        "seq_id",
        F.col(id_col),
        F.slice(
            F.col(tokens_col),
            (seg_start + 1).cast("int"),
            (seg_end - seg_start).cast("int"),
        ).alias("chunk"),
    )
    packed = seg.groupBy("seq_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(id_col), F.col("chunk")))),
                lambda s: s.getField("chunk"),
            )
        ).alias(tokens_col),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return packed.select(
        F.col("seq_id").cast("long"),
        tokens_col,
        F.size(tokens_col).alias("n_tokens"),
        F.col("n_docs").cast("long"),
    )


def token_vocab(
    df: DataFrame,
    k: int = 50,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Top-k token frequency histogram (token, n), count-desc with a
    token-asc tiebreak. One explode + one partially-aggregated shuffle
    of (token, count) pairs — the canonical vocabulary scan."""
    return (
        df.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.col("token"))
        .limit(k)
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 5,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Deterministic train/validation split by id hash (the standard
    leakage-safe held-out split: membership is a pure function of the
    id, stable across runs, cluster sizes and data order).

    Adds a ``split`` column ('val' for hash%100 < val_pct else
    'train'). ``hash_mode='md5'`` uses the DuckDB-portable 28-bit md5
    prefix (oracle mode); the default is the pure-JVM xxhash64.
    """
    sid = F.col(id_col).cast("string")
    if hash_mode == "md5":
        h = F.conv(F.substring(F.md5(sid), 1, 7), 16, 10).cast("long")
    elif hash_mode == "xxhash64":
        h = F.abs(F.xxhash64(sid))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r} (md5|xxhash64)")
    return df.withColumn(
        "split",
        F.when(F.pmod(h, F.lit(100)) < val_pct, F.lit("val")).otherwise(
            F.lit("train")
        ),
    )


def length_histogram(
    df: DataFrame,
    bucket_size: int = 128,
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Sequence-length distribution: per length bucket, document count
    and min/max length (one narrow aggregate — scan-speed)."""
    b = F.floor(F.col(n_tok_col) / bucket_size).cast("long")
    return (
        df.groupBy(b.alias("len_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(n_tok_col).alias("min_len"),
            F.max(n_tok_col).alias("max_len"),
        )
        .orderBy("len_bucket")
    )


def oov_against_vocab(
    df: DataFrame,
    vocab: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary token counts against a fixed
    vocabulary (e.g. ``token_vocab(df, k)``'s top-k).

    Returns (id, n_tok, n_oov) — the OOV rate is ``n_oov / n_tok``.
    The vocabulary is tiny by construction (top-k), so membership is a
    BROADCAST left join against the exploded token stream followed by
    one per-doc partially-aggregated count — no shuffle of the corpus
    beyond the per-doc aggregation, flat at 100-TB corpus scale.
    """
    v = vocab.select(F.col("token").alias("_vtok")).withColumn("_in", F.lit(1))
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens_col).alias("token"))
    return (
        tok.join(F.broadcast(v), tok.token == v._vtok, "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
    )
