"""Deduplication operators for training-data pipelines.

All pure DataFrame/SQL compositions (JVM-side, codegen'd). Where a
hash is needed the operators take ONE base hash per shingle/word and
derive the k-hash family arithmetically (affine transforms mod a
Mersenne prime — the standard "one hash, k permutations" MinHash
construction), so the per-row hashing cost is O(1) in k instead of
O(k). The base hash is selectable:

* ``xxhash64`` (default) — pure JVM integer path, the 100-TB mode;
* ``md5`` — bit-identical in DuckDB (``CAST('0x'||substr(md5(x),1,7)
  AS BIGINT)`` == Spark ``conv(substring(md5(x),1,7),16,10)``), used
  by the oracle-checked driver queries.

At scale:

* exact dedup = one hash-aggregate shuffle on the digest;
* n-gram Jaccard = explode -> distinct -> document-frequency cap on
  hot shingles (a corpus-wide common trigram would otherwise make the
  self-join quadratic in its frequency) -> self-equi-join on shingle
  -> pair aggregate;
* MinHash+LSH = the classic shingle -> K minhashes -> B bands ->
  bucket equi-join; candidate volume is controlled by (K, B), and the
  join is an equi-join on the band key so it broadcasts/shuffles
  like any other key join instead of a quadratic cross.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: modulus of the affine hash family (Mersenne prime 2^31-1); base
#: hash and family parameters stay < 2^31 so a*h+b < 2^62 never
#: overflows signed-64 arithmetic in either Spark (ANSI) or DuckDB.
MERSENNE31 = (1 << 31) - 1


def affine_params(n_hashes: int, seed: int = 0xC0FFEE) -> list[tuple[int, int]]:
    """Deterministic (a_k, b_k) pairs for the k-minhash affine family.

    Pure-python LCG so the identical constants can be embedded as
    literals in the DuckDB oracle SQL (no numpy version dependence).
    """
    params, x = [], (seed * 2654435761 + 1) % (1 << 31)
    for _ in range(n_hashes):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = (x % (MERSENNE31 - 1)) + 1
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x % MERSENNE31
        params.append((a, b))
    return params


def base_hash_expr(col, kind: str = "xxhash64") -> Column:
    """Base shingle hash in [0, 2^31): one hash call per row, k-free.

    ``md5`` keeps 28 bits (7 hex digits) so the DuckDB twin
    ``CAST('0x'||substr(md5(x),1,7) AS BIGINT)`` is value-identical.
    """
    if kind == "md5":
        return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")
    if kind == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(MERSENNE31))
    raise ValueError(f"unknown base hash {kind!r} (md5|xxhash64)")


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


def word_shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    distinct: bool = True,
    local_distinct: bool = False,
) -> DataFrame:
    """Word n-gram shingles per document: (id, shingle).

    ``distinct=True`` (set semantics — REQUIRED for Jaccard) costs a
    full shuffle of the exploded shingles; operators whose aggregate
    is duplicate-insensitive (MIN for minhash) pass ``distinct=False``
    and skip that shuffle entirely.

    ``local_distinct=True`` dedupes each DOCUMENT's gram array before
    the explode (``array_distinct`` — no shuffle): duplicate-
    insensitive consumers skip hashing repeated within-doc shingles.
    Never set together with ``distinct`` (the global distinct already
    subsumes it).
    """
    # materialize the split word array ONCE per row (higher-order
    # functions run interpreted — no codegen subexpression elimination
    # — so referencing the split-of-normalized expression inside the
    # per-gram lambda would re-run the regex+split per ELEMENT,
    # O(len^2) per document; same trap winnow_fingerprints documents)
    base = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_ws"),
    )
    ws = F.col("_ws")
    # sliding n-gram via transform over index range (JVM-side, no UDF)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
    )
    if local_distinct:
        grams = F.array_distinct(grams)
    sh = base.select("id", F.explode(grams).alias("shingle")).filter(
        F.length("shingle") > 0
    )
    return sh.distinct() if distinct else sh


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (id_a < id_b).

    Returns integer intersection/union sizes so the result is
    float-free (oracle-hash stable); jaccard = n_inter/n_union.

    ``max_shingle_df`` (opt-in; default ``None`` = exact Jaccard) drops
    shingles whose document frequency exceeds the cap BEFORE the
    self-join: a corpus-wide common trigram otherwise contributes df^2
    candidate rows (quadratic blow-up at 100-TB corpora) — pass a cap
    (e.g. 10_000) for any large-corpus run. The capped variant is an
    approximation: intersection/union are computed over the capped
    shingle space (sizes recomputed after the cap so n_inter/n_union
    stay mutually consistent). The hot-shingle list is tiny by
    construction, so it is removed with a broadcast anti-join.
    """
    sh = word_shingles(df, text_col, id_col, n)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
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
    base_hash: str = "xxhash64",
) -> DataFrame:
    """MinHash via ONE base hash + k affine minima (integer, O(1) in k).

    minhash_k(doc) = min over shingles of (a_k*h(shingle)+b_k) mod
    (2^31-1) — the classic universal-hash-family construction; one
    hash call and k fused multiply-adds per shingle instead of k
    digest computations, and integer (not hex-string) min aggregates.
    ``base_hash='md5'`` gives the DuckDB-portable variant.

    MIN is duplicate-insensitive, so the shingle set is NOT globally
    deduplicated — that skips the distinct's full shuffle; the only
    exchange left is the groupBy(id) partial-aggregated min. Each
    document's gram array IS locally deduplicated (array_distinct,
    shuffle-free) so repeated within-doc shingles hash once — the
    minima are unchanged (MIN over a set equals MIN over its
    multiset), matching the oracle's DISTINCT-gram CTE.
    """
    sh = word_shingles(
        df, text_col, id_col, shingle_n, distinct=False, local_distinct=True
    )
    h = sh.select("id", base_hash_expr(F.col("shingle"), base_hash).alias("h0"))
    aggs = [
        F.min((F.lit(a) * F.col("h0") + F.lit(b)) % F.lit(MERSENNE31)).alias(f"mh{k}")
        for k, (a, b) in enumerate(affine_params(n_hashes))
    ]
    return h.groupBy("id").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """LSH candidate pairs: equal band signature in any band (id_a < id_b).

    The band key is the concatenated minhash values themselves (no
    digest step): exact and engine-portable. Pairs come from ONE
    bucket aggregate — group the band rows on (band, bh), keep
    buckets with >= 2 members, expand each bucket's sorted id array
    into its ordered pairs with JVM array expressions. The previous
    self-equi-join computed the whole shingle->minhash pipeline TWICE
    (the broadcast build side duplicates the subtree — no exchange
    reuse across exchange kinds), doubling the dominant hash/aggregate
    cost; the bucket aggregate computes it once and scales the same
    way (candidate volume is still bounded by bucket sizes via
    (K, B)). Result set unchanged: every unordered same-bucket pair,
    emitted lo->hi, deduped across bands.
    """
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n, base_hash)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *parts).alias("bh"))
        )
    buckets = sig.select(
        "id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    grouped = (
        buckets.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    ids = F.col("ids")
    pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        grouped.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
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


def simhash_bits(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Engine-portable 64-bit SimHash as a '0'/'1' string (MSB first).

    Word bits come from md5: hi = first 8 hex digits, lo = next 8 —
    two 32-bit halves DuckDB reproduces exactly via
    ``CAST('0x'||substr(md5(w),1,8) AS BIGINT)``, so the whole
    signature (votes, ties-to-0 sign rule, bit order) has an exact
    SQL oracle. Same vote semantics as :func:`simhash64` (every word
    occurrence votes, frequency-weighted).
    """
    words = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w")
    wdf = df.select(F.col(id_col).alias("id"), words).filter(F.length("w") > 0)
    wdf = wdf.select(
        "id",
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(F.md5("w"), 9, 8), 16, 10).cast("long").alias("lo"),
    )
    votes = []
    for i in range(64):
        src, sh = ("lo", i) if i < 32 else ("hi", i - 32)
        bit = F.shiftright(F.col(src), sh).bitwiseAND(F.lit(1))
        votes.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"b{i}"))
    agg = wdf.groupBy("id").agg(*votes)
    chars = [
        F.when(F.col(f"b{i}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(63, -1, -1)
    ]
    return agg.select("id", F.concat(*chars).alias("simhash_bits"))


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination report: for each eval document, how many
    of its distinct word n-grams appear anywhere in the training
    corpus (the standard n-gram-overlap decontamination check run
    before training on scraped data).

    Returns (eval_id, n_shingles, n_contaminated); the contamination
    ratio is n_contaminated/n_shingles. Dataflow: distinct shingles on
    both sides (train side deduped corpus-wide, so the join probe is
    the distinct-shingle set, not the corpus), one equi-join on the
    shingle + one count aggregate — at scale this is a semi-join
    against a shingle dictionary, no O(train x eval) pairing. A LEFT
    join keeps eval docs with zero overlap in the report.
    """
    ev = word_shingles(eval_df, text_col, id_col, n).withColumnRenamed(
        "id", "eval_id"
    )
    tr = word_shingles(train, text_col, id_col, n).select("shingle").distinct()
    hit = tr.withColumn("_hit", F.lit(1))
    return (
        ev.join(hit, "shingle", "left")
        .groupBy("eval_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        )
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 8,
) -> DataFrame:
    """(id, comp) labels over the undirected pair graph: iterative
    min-label propagation, ``comp`` = min id reachable from ``id``
    (so the label IS the component's canonical representative).

    Per-iteration ``localCheckpoint`` truncates the join-loop lineage
    so the plan stays O(1) per round instead of growing by one join
    each iteration — at billions of edges the un-truncated plan
    explodes long before the data does. Converges in <= graph
    diameter rounds (near-dup graphs are shallow; ``max_iters``
    bounds pathological chains) with an exchange-count probe for
    early exit. Only ids that appear in some pair are labeled.
    """
    edges = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .unionAll(pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b")))
        .distinct()
        .cache()
    )
    try:
        labels = (
            edges.select(F.col("a").alias("id"))
            .distinct()
            .withColumn("comp", F.col("id"))
            .localCheckpoint()
        )
        changed = 0
        for _ in range(max_iters):
            neigh = (
                edges.join(labels, edges.b == labels.id)
                .groupBy("a")
                .agg(F.min("comp").alias("ncomp"))
            )
            new_labels = (
                labels.join(neigh, labels.id == neigh.a, "left")
                .select(
                    "id",
                    F.least(
                        F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                    ).alias("comp"),
                )
            ).localCheckpoint()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        if changed:
            # comp == component-min no longer guaranteed: callers like
            # canonicalize_duplicates would keep EXTRA "representatives".
            # Deep chains need max_iters ~ graph diameter (or pointer-
            # doubling); fail loudly rather than silently under-dedup.
            import warnings

            warnings.warn(
                f"connected_components did not converge in {max_iters} "
                f"iterations ({changed} labels still changing); comp labels "
                "may not be component minima — raise max_iters",
                RuntimeWarning,
                stacklevel=2,
            )
    finally:
        # labels are localCheckpoint-materialized; the edge cache is
        # only a loop-speedup and must not leak across calls
        edges.unpersist()
    return labels


def canonicalize_duplicates(
    df: DataFrame, labels: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Materialize the deduplicated corpus: keep exactly one document
    per duplicate component — the one whose id equals the component's
    min-id label (``connected_components`` guarantees comp == min id
    of the component) — plus every document in no component.

    One anti-join against the (small relative to the corpus) set of
    non-representative members; no shuffle of the corpus beyond the
    join itself.
    """
    drop = labels.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def positioned_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int = 5
) -> DataFrame:
    """Word n-gram shingles WITH their token position: (id, pos, shingle).

    Same gram construction as :func:`word_shingles` (so the two agree
    token-for-token) but keeps the 0-based starting-token index via
    ``posexplode`` — the input to passage-level (positional) dedup,
    where *where* a duplicated shingle sits matters, not just that it
    exists. Never distinct: positions are unique per (id, pos) by
    construction.
    """
    # split materialized once per row — see word_shingles (the lambda
    # would otherwise re-run the regex per gram, O(len^2) per doc)
    base = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_ws"),
    )
    ws = F.col("_ws")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
    )
    return base.select(
        "id", F.posexplode(grams).alias("pos", "shingle")
    ).filter(F.length("shingle") > 0)


def duplicated_passage_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_tokens: int | None = None,
    scope: str = "cross_doc",
) -> DataFrame:
    """Maximal duplicated passages per document — the exact
    substring-level dedup of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better"), re-expressed as a relational
    composition instead of a suffix array: a token is duplicated iff
    some word n-gram covering it also occurs elsewhere in the corpus.

    Returns (id, span_start, span_end, span_tokens): 0-based inclusive
    token bounds of each maximal duplicated span. Span coverage is
    exact — duplicated shingles at positions p cover tokens
    [p, p+n-1]; runs whose position gap is <= n have overlapping or
    adjacent coverage and are merged into one span (gaps-and-islands
    on the position sequence), so spans are disjoint and
    sum(span_tokens) is the true duplicated-token count.

    ``scope``:
      * ``"cross_doc"`` (default) — a shingle is duplicated iff it
        appears in >= 2 DISTINCT documents (decided by
        ``MIN(id) <> MAX(id)``: one map-side-combinable aggregate, no
        count-distinct expansion and no distinct pre-shuffle);
      * ``"corpus"`` — any >= 2 occurrences, including self-repeats
        within one document.

    At 100 TB: the duplicated-shingle dictionary is ONE hash aggregate
    on the shingle key; positions rejoin it with an equi-join (linear
    in corpus shingles — no self-join, so hot shingles cost dictionary
    entries, not df^2 candidate pairs); the islands window partitions
    by document, so its sort is bounded by document length, never the
    corpus. ``min_tokens`` (Lee et al. used 50) drops short spans
    AFTER merging.
    """
    if scope not in ("cross_doc", "corpus"):
        raise ValueError(f"scope must be cross_doc|corpus, got {scope!r}")
    sh = positioned_shingles(df, text_col, id_col, n)
    agg = (
        (F.min("id") != F.max("id"))
        if scope == "cross_doc"
        else (F.count(F.lit(1)) > 1)
    )
    dup_dict = sh.groupBy("shingle").agg(agg.alias("_dup")).filter("_dup").select("shingle")
    hits = sh.join(dup_dict, "shingle").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos", 1).over(w) > n, 1).otherwise(0)
    islands = hits.withColumn("_island", F.sum(brk).over(w))
    spans = (
        islands.groupBy("id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n - 1).alias("span_end"),
        )
        .withColumn("span_tokens", F.col("span_end") - F.col("span_start") + 1)
        .select("id", "span_start", "span_end", "span_tokens")
    )
    if min_tokens is not None:
        spans = spans.filter(F.col("span_tokens") >= min_tokens)
    return spans


def duplicated_passage_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_tokens: int | None = None,
    scope: str = "cross_doc",
) -> DataFrame:
    """Per-document duplicated-passage report: (id, n_spans,
    dup_tokens, n_tokens) — the corpus-health view of
    :func:`duplicated_passage_spans` (dup_tokens/n_tokens is the
    duplicated fraction; integers only, so oracle-hash stable).
    Documents with no duplicated span appear with zeros (LEFT join),
    so the report covers the whole corpus.
    """
    spans = duplicated_passage_spans(df, text_col, id_col, n, min_tokens, scope)
    per_doc = spans.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    toks = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(normalize_text(F.col(text_col)), " ")).alias("n_tokens"),
    )
    return toks.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        "n_tokens",
    )


def strip_duplicated_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_tokens: int | None = None,
    scope: str = "cross_doc",
) -> DataFrame:
    """Rewrite the corpus with duplicated passages REMOVED — the
    materialization step of substring-level dedup (every other column
    passes through; ``text_col`` is replaced by the normalized text
    with covered tokens dropped).

    Spans ride back to their documents as a collected array (bounded
    by document length — spans are disjoint, so at most
    len(doc)/(n+1) per doc) and the token filter runs as a JVM
    higher-order function (``filter(words, (w, i) -> ...)``) — no
    Python in the row path.
    """
    spans = (
        duplicated_passage_spans(df, text_col, id_col, n, min_tokens, scope)
        .groupBy("id")
        .agg(F.collect_list(F.struct("span_start", "span_end")).alias("_spans"))
        .withColumnRenamed("id", "__strip_id")
    )
    joined = df.join(
        spans, df[id_col] == F.col("__strip_id"), "left"
    ).withColumn("_spans", F.coalesce("_spans", F.array()))
    words = F.split(normalize_text(F.col(text_col)), " ")
    kept = F.filter(
        words,
        lambda w, i: ~F.exists(
            F.col("_spans"),
            lambda sp: (i >= sp["span_start"]) & (i <= sp["span_end"]),
        ),
    )
    out = joined.withColumn(text_col, F.concat_ws(" ", kept))
    return out.drop("_spans", "__strip_id")
