"""Deduplication operators for training-data pipelines.

All pure DataFrame/SQL compositions (JVM-side, codegen'd); hash
functions are md5 so every operator has an exact cross-engine oracle
(DuckDB md5 == Spark md5). At scale:

* exact dedup = one hash-aggregate shuffle on the digest;
* n-gram Jaccard = explode -> distinct -> self-equi-join on shingle
  (AQE handles the skew of hot shingles) -> pair aggregate;
* MinHash+LSH = the classic shingle -> K minhashes -> B bands ->
  bucket equi-join; candidate volume is controlled by (K, B), and the
  join is an equi-join on the band digest so it broadcasts/shuffles
  like any other key join instead of a quadratic cross.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def normalize_text(c):
    """Lowercase, collapse whitespace — shared doc normalization."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) documents: digest, count, ids."""
    return (
        df.select(F.md5(normalize_text(F.col(text_col))).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per identical-text group."""
    digest = F.md5(normalize_text(F.col(text_col))).alias("_digest")
    ranked = df.select("*", digest).withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy("_digest").orderBy(id_col)),
    )
    return ranked.filter(F.col("_rn") == 1).drop("_digest", "_rn")


def word_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    # sliding n-gram via transform over index range (JVM-side, no UDF)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .filter(F.length("shingle") > 0)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (id_a < id_b).

    Returns integer intersection/union sizes so the result is
    float-free (oracle-hash stable); jaccard = n_inter/n_union.
    """
    sh = word_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .filter(F.col("n_inter") >= F.col("n_union") * threshold)
    )
    return out.select("id_a", "id_b", "n_inter", "n_union")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash via k seeded md5 minima (portable across engines).

    minhash_k(doc) = min over shingles of md5(k || ':' || shingle).
    md5 is uniform, so the min over hex strings behaves like a random
    permutation minimum — the standard MinHash estimator.
    """
    sh = word_shingles(df, text_col, id_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{k}:"), F.col("shingle")))).alias(f"mh{k}")
        for k in range(n_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: equal band-digest in any band (id_a < id_b)."""
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("bh"))
        )
    buckets = sig.select(
        "id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    x = buckets.alias("x")
    y = buckets.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word hashes (xxhash64) — Spark-native bit votes.

    For each of 64 bit positions, sum +-1 votes weighted by word
    frequency; bit = 1 if the vote is positive. Composed from explode +
    groupBy + bit arithmetic, no UDF.
    """
    words = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w")
    wdf = df.select(F.col(id_col).alias("id"), words).filter(F.length("w") > 0)
    h = F.xxhash64("w")
    votes = [
        F.sum(
            F.when((F.shiftright(h, i).bitwiseAND(F.lit(1))) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = wdf.groupBy("id").agg(*votes)
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << i).cast("long") if i < 63 else F.when(
            F.col("b63") > 0, F.lit(-(2**63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return agg.select("id", sim.alias("simhash"))
