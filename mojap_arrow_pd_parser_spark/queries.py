"""Driver-contract query registry: Spark implementation + DuckDB oracle.

Every operator from SURVEY.md §2 that is SQL-expressible appears here
twice: once as a Spark DataFrame program (the engine under test) and
once as ANSI-ish DuckDB SQL (the oracle). Conventions for hash-stable
cross-engine comparison:

* no raw float outputs — money/value aggregates go through
  DECIMAL(12,2) input casts (exact for 2-dec data) with a final
  explicit DECIMAL cast; similarity scores are ``round(x, 5)``;
* timestamps leave as formatted strings; counts as BIGINT;
* every computed column aliased identically on both sides;
* deterministic total order where LIMIT is involved (tiebreak on id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators import dedup, similarity, textstats
from .plans.chunking import salt_skewed


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The grading driver supplies its own session; pin the confs the
    # oracle comparison depends on (UTC timestamps, Arrow exec).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Memoize the scan DATAFRAME (a lazy plan, never data): each
    # spark.read.parquet costs ~100ms of driver round trips, and a
    # 5-table query pays it five times per invocation. The cache lives
    # on the session object so it dies with the session; every
    # execution still reads the parquet bytes fresh.
    cache = getattr(spark, "_mojap_table_plans", None)
    if cache is None:
        cache = {}
        spark._mojap_table_plans = cache
    key = (sf_dir, name)
    df = cache.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        cache[key] = df
    return df


#: memoized scan-spread decisions: (sf_dir, name, target) -> bool.
#: A plan-shape decision derived from the file layout, never a result.
_SPREAD_CACHE: dict[tuple, bool] = {}


def _spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``_t`` plus a scale-adaptive scan spread, for tables feeding
    EXPENSIVE narrow work (regex projections, shingle explode+hash).

    The driver testdata tables are single-file single-row-group
    parquet, so a scan — and every narrow operator chained onto it —
    otherwise runs as ONE task while the other cores idle (guide §2.5
    "input skew: one huge unsplittable file — repartition immediately
    after the read"). When the scan yields far fewer partitions than
    the cluster has slots, pay one small round-robin shuffle of the
    few-MB table to spread the downstream per-row work. On a
    production table (files/row groups >= cluster slots) the condition
    is false and NO shuffle is added — this never re-shuffles data at
    scale. Applied only where the per-row work dwarfs the shuffle
    (cheap scans keep the shuffle-free single-stage plan)."""
    df = _t(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    key = (sf_dir, name, target)
    spread = _SPREAD_CACHE.get(key)
    if spread is None:
        try:
            spread = df.rdd.getNumPartitions() * 2 <= target
        except Exception:
            spread = False
        _SPREAD_CACHE[key] = spread
    return df.repartition(target) if spread else df


def _dec(c, p=12, s=2):
    return c.cast(f"decimal({p},{s})")


# ---------------------------------------------------------------------------
# Relational core (scan/filter/agg/join/window/set — SURVEY §2.5 extensions)
# ---------------------------------------------------------------------------


def _cents(c):
    """2-decimal double -> exact integer cents (engine-portable)."""
    return F.round(c * 100).cast("long")


def q01_pricing_summary(spark, sf):
    """TPC-H Q1-style aggregate; money in exact integer cents so the
    result hashes identically in any engine/float representation."""
    li = _t(spark, sf, "lineitem").filter(F.col("l_quantity") < 30)
    qty_c = _cents(F.col("l_quantity"))
    price_c = _cents(F.col("l_extendedprice"))
    disc_c = _cents(F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("sum_qty_x100"),
            F.sum(price_c).alias("sum_base_price_x100"),
            F.sum(price_c * (F.lit(100) - disc_c)).alias("sum_disc_price_x10000"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_Q01 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_x100,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_x100,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_x10000,
       COUNT(*) AS count_order
FROM lineitem WHERE l_quantity < 30
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q02_top_customers(spark, sf):
    """Broadcast join + top-k: top 10 customers by order revenue."""
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer")
    return (
        orders.groupBy("o_custkey")
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("revenue_x100"),
             F.count(F.lit(1)).alias("n_orders"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select("c_custkey", "c_name", "revenue_x100", "n_orders")
        .orderBy(F.desc("revenue_x100"), "c_custkey")
        .limit(10)
    )


SQL_Q02 = """
SELECT c_custkey, c_name, revenue_x100, n_orders FROM (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_x100,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
) o JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY revenue_x100 DESC, c_custkey LIMIT 10
"""


def q03_nation_revenue(spark, sf):
    """Star join across 5 tables (dims broadcast), revenue per nation."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer")
    nation = _t(spark, sf, "nation")
    region = _t(spark, sf, "region")
    rev = _cents(F.col("l_extendedprice")) * (F.lit(100) - _cents(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).alias("revenue_x10000"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("r_name", "n_name")
    )


SQL_Q03 = """
SELECT r_name, n_name,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_x10000,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY r_name, n_name
"""


def q04_sessionize(spark, sf):
    """Gaps-and-islands sessionization: 30-min inactivity gap per user."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    # parquet timestamps arrive as TIMESTAMP_NTZ; session TZ is UTC so the
    # cast is shift-free
    ts = F.col("ts").cast("timestamp")
    gap_us = F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w))
    new_session = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    return (
        ev.withColumn("new_s", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


SQL_Q04 = """
SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, COUNT(*) AS n_events FROM (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
) t GROUP BY user_id ORDER BY user_id
"""


def q05_rle_runs(spark, sf):
    """RLE analysis as a query (N3 analog): run counts of l_returnflag
    within each order, gaps-and-islands over (orderkey, linenumber)."""
    li = _t(spark, sf, "lineitem")
    # l_linenumber may repeat within an order in this synthetic data; add
    # l_returnflag as tiebreak so run boundaries are engine-deterministic
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_returnflag")
    start = F.when(
        F.lag("l_returnflag").over(w).isNull()
        | (F.col("l_returnflag") != F.lag("l_returnflag").over(w)),
        1,
    ).otherwise(0)
    return (
        li.withColumn("run_start", start)
        .groupBy("l_returnflag")
        .agg(F.sum("run_start").alias("n_runs"), F.count(F.lit(1)).alias("n_rows"))
        .orderBy("l_returnflag")
    )


SQL_Q05 = """
SELECT l_returnflag, CAST(SUM(run_start) AS BIGINT) AS n_runs, COUNT(*) AS n_rows FROM (
  SELECT l_returnflag,
         CASE WHEN lag(l_returnflag) OVER w IS NULL
                OR l_returnflag <> lag(l_returnflag) OVER w
              THEN 1 ELSE 0 END AS run_start
  FROM lineitem WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_returnflag)
) t GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q06_dict_stats(spark, sf):
    """Dictionary-encoding stats per source (N2 analog): ndv + code bits."""
    d = _t(spark, sf, "documents")
    ndv = F.countDistinct("lang")
    bits = F.when(ndv <= 1, F.lit(0)).otherwise(F.length(F.bin(ndv - 1)))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            ndv.alias("ndv_lang"),
            bits.cast("int").alias("code_bits"),
        )
        .orderBy("source")
    )


SQL_Q06 = """
SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS ndv_lang,
       CAST(CASE WHEN COUNT(DISTINCT lang) <= 1 THEN 0
            ELSE length(bin(COUNT(DISTINCT lang) - 1)) END AS INT) AS code_bits
FROM documents GROUP BY source ORDER BY source
"""


def q07_codec_choice(spark, sf):
    """The cost model (N7) as SQL: per-source stats on n_chars pick a codec."""
    d = _t(spark, sf, "documents")
    n = F.count(F.lit(1))
    rng = F.max("n_chars") - F.min("n_chars")
    ndv = F.countDistinct("n_chars")
    for_bits = F.when(rng <= 0, F.lit(0)).otherwise(F.length(F.bin(rng)))
    code_bits = F.when(ndv <= 1, F.lit(0)).otherwise(F.length(F.bin(ndv - 1)))
    plain_b = n * 8
    ffor_b = F.floor((n * for_bits + 7) / 8) + 64
    dict_b = ndv * 8 + F.floor((n * code_bits + 7) / 8) + 128
    label = (
        F.when((ffor_b <= plain_b) & (ffor_b <= dict_b), F.lit("ffor"))
        .when(dict_b <= plain_b, F.lit("dict"))
        .otherwise(F.lit("plain"))
    )
    return (
        d.groupBy("source")
        .agg(
            n.alias("n_vals"),
            F.min("n_chars").alias("v_min"),
            F.max("n_chars").alias("v_max"),
            ndv.alias("ndv"),
            plain_b.cast("long").alias("plain_bytes"),
            ffor_b.cast("long").alias("ffor_bytes"),
            dict_b.cast("long").alias("dict_bytes"),
            label.alias("codec"),
        )
        .orderBy("source")
    )


SQL_Q07 = """
SELECT source, COUNT(*) AS n_vals, MIN(n_chars) AS v_min, MAX(n_chars) AS v_max,
       COUNT(DISTINCT n_chars) AS ndv,
       CAST(COUNT(*) * 8 AS BIGINT) AS plain_bytes,
       CAST((COUNT(*) * (CASE WHEN MAX(n_chars)-MIN(n_chars) <= 0 THEN 0 ELSE length(bin(MAX(n_chars)-MIN(n_chars))) END) + 7) // 8 + 64 AS BIGINT) AS ffor_bytes,
       CAST(COUNT(DISTINCT n_chars) * 8 + (COUNT(*) * (CASE WHEN COUNT(DISTINCT n_chars) <= 1 THEN 0 ELSE length(bin(COUNT(DISTINCT n_chars)-1)) END) + 7) // 8 + 128 AS BIGINT) AS dict_bytes,
       CASE WHEN (COUNT(*) * (CASE WHEN MAX(n_chars)-MIN(n_chars) <= 0 THEN 0 ELSE length(bin(MAX(n_chars)-MIN(n_chars))) END) + 7) // 8 + 64 <= COUNT(*) * 8
             AND (COUNT(*) * (CASE WHEN MAX(n_chars)-MIN(n_chars) <= 0 THEN 0 ELSE length(bin(MAX(n_chars)-MIN(n_chars))) END) + 7) // 8 + 64 <= COUNT(DISTINCT n_chars) * 8 + (COUNT(*) * (CASE WHEN COUNT(DISTINCT n_chars) <= 1 THEN 0 ELSE length(bin(COUNT(DISTINCT n_chars)-1)) END) + 7) // 8 + 128
            THEN 'ffor'
            WHEN COUNT(DISTINCT n_chars) * 8 + (COUNT(*) * (CASE WHEN COUNT(DISTINCT n_chars) <= 1 THEN 0 ELSE length(bin(COUNT(DISTINCT n_chars)-1)) END) + 7) // 8 + 128 <= COUNT(*) * 8
            THEN 'dict' ELSE 'plain' END AS codec
FROM documents GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Conform layer as queries (C1-C8)
# ---------------------------------------------------------------------------


def q08_conform_cast(spark, sf):
    """Reference caster semantics on lineitem: numeric/date/bool conform."""
    from .functions.conform import bool_expr

    li = _t(spark, sf, "lineitem")
    is_returned = bool_expr(
        F.col("l_returnflag"), "l_returnflag",
        bool_map={"r": True, "a": True, "n": False}, errors="raise",
        src_type=None,
    )
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        _cents(F.col("l_quantity")).alias("qty_x100"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_iso"),
        is_returned.alias("is_returned"),
    )


SQL_Q08 = """
SELECT l_orderkey, l_linenumber,
       CAST(round(l_quantity * 100) AS BIGINT) AS qty_x100,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_iso,
       CASE WHEN l_returnflag IS NULL OR trim(lower(l_returnflag)) = '' THEN NULL
            WHEN trim(lower(l_returnflag)) IN ('r','a') THEN TRUE
            WHEN trim(lower(l_returnflag)) = 'n' THEN FALSE END AS is_returned
FROM lineitem ORDER BY l_orderkey, l_linenumber
"""


def q09_timestamp_conform(spark, sf):
    """C8 end-to-end: stringify with a custom format, parse back, emit ISO."""
    from .functions.conform import timestamp_expr
    from pyspark.sql import types as T

    ev = _t(spark, sf, "events")
    as_str = F.date_format("ts", "dd-MMM-yyyy HH:mm:ss")
    parsed = timestamp_expr(
        as_str, "ts", T.TimestampType(), datetime_format="%d-%b-%Y %H:%M:%S",
        errors="raise",
    )
    return ev.select(
        "event_id",
        F.date_format(parsed, "yyyy-MM-dd HH:mm:ss").alias("ts_iso"),
    )


SQL_Q09 = """
SELECT event_id,
       strftime(strptime(strftime(ts, '%d-%b-%Y %H:%M:%S'), '%d-%b-%Y %H:%M:%S'),
                '%Y-%m-%d %H:%M:%S') AS ts_iso
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Dedup suite
# ---------------------------------------------------------------------------


def _duplicated_docs(spark, sf, near: bool = False):
    """documents ∪ shifted-id copies (exact or near duplicates).

    Spread (guide §2.5): the dedup operators chain shingle explode +
    per-shingle hashing onto this scan — far heavier than the few-MB
    shuffle that parallelizes it."""
    d = _spread(spark, sf, "documents").select("doc_id", "text")
    if near:
        twin = d.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" near duplicate suffix")).alias("text"),
        )
    else:
        twin = d.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    return d.unionAll(twin)


_SQL_DUP_DOCS_EXACT = """
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents
"""

_SQL_DUP_DOCS_NEAR = """
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000 AS doc_id, text || ' near duplicate suffix' AS text FROM documents
"""


def q10_dedup_exact(spark, sf):
    corpus = _duplicated_docs(spark, sf, near=False)
    g = dedup.exact_dup_groups(corpus, "text", "doc_id")
    return g.select(
        "digest",
        "n_docs",
        F.array_min("ids").alias("min_id"),
        F.array_max("ids").alias("max_id"),
    ).orderBy("digest")


SQL_Q10 = f"""
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS digest,
       COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM ({_SQL_DUP_DOCS_EXACT}) corpus
GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY digest
"""


def q11_ngram_jaccard(spark, sf):
    corpus = _duplicated_docs(spark, sf, near=True)
    pairs = dedup.ngram_jaccard_pairs(corpus, "text", "doc_id", n=3, threshold=0.8)
    return pairs.orderBy("id_a", "id_b")


SQL_Q11 = f"""
WITH corpus AS ({_SQL_DUP_DOCS_NEAR}),
docs AS (
  SELECT doc_id AS id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM corpus
),
words AS (SELECT id, string_split(t, ' ') AS ws FROM docs),
grams AS (
  SELECT DISTINCT id, array_to_string(ws[i:i+2], ' ') AS shingle
  FROM words, UNNEST(generate_series(1, greatest(len(ws) - 2, 1))) AS u(i)
  WHERE length(array_to_string(ws[i:i+2], ' ')) > 0
),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM grams GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b, n_inter, sa.n_sh + sb.n_sh - n_inter AS n_union
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE n_inter >= (sa.n_sh + sb.n_sh - n_inter) * 0.8
ORDER BY id_a, id_b
"""


def q12_minhash_lsh(spark, sf):
    corpus = _duplicated_docs(spark, sf, near=True)
    return dedup.minhash_lsh_candidates(
        corpus, "text", "doc_id", n_hashes=8, bands=4, shingle_n=3,
        base_hash="md5",  # oracle-portable base; prod default is xxhash64
    ).orderBy("id_a", "id_b")


def _sql_minhash(n_hashes: int, bands: int) -> str:
    """DuckDB twin of minhash_lsh_candidates(base_hash='md5'):
    one 28-bit md5-derived base hash per shingle, k affine minima
    mod 2^31-1 with the SAME (a_k, b_k) constants (dedup.affine_params),
    band key = concatenated minhash values."""
    rows = n_hashes // bands
    m = dedup.MERSENNE31
    mh_cols = ",\n    ".join(
        f"MIN(({a} * h0 + {b}) % {m}) AS mh{k}"
        for k, (a, b) in enumerate(dedup.affine_params(n_hashes))
    )
    band_rows = []
    for b in range(bands):
        parts = " || '|' || ".join(
            f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_rows.append(f"SELECT id, {b} AS band, {parts} AS bh FROM sig")
    bands_sql = " UNION ALL ".join(band_rows)
    return f"""
WITH corpus AS ({_SQL_DUP_DOCS_NEAR}),
docs AS (
  SELECT doc_id AS id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM corpus
),
words AS (SELECT id, string_split(t, ' ') AS ws FROM docs),
grams AS (
  SELECT DISTINCT id, array_to_string(ws[i:i+2], ' ') AS shingle
  FROM words, UNNEST(generate_series(1, greatest(len(ws) - 2, 1))) AS u(i)
  WHERE length(array_to_string(ws[i:i+2], ' ')) > 0
),
hashed AS (
  SELECT id, CAST('0x' || substr(md5(shingle), 1, 7) AS BIGINT) AS h0 FROM grams
),
sig AS (SELECT id, {mh_cols} FROM hashed GROUP BY id),
buckets AS ({bands_sql})
SELECT DISTINCT x.id AS id_a, y.id AS id_b
FROM buckets x JOIN buckets y
  ON x.band = y.band AND x.bh = y.bh AND x.id < y.id
ORDER BY id_a, id_b
"""


SQL_Q12 = _sql_minhash(8, 4)


# ---------------------------------------------------------------------------
# Text analysis suite
# ---------------------------------------------------------------------------


def q13_text_stats(spark, sf):
    return textstats.text_stats(_t(spark, sf, "documents"))


SQL_Q13 = r"""
SELECT doc_id,
       length(text) AS n_chars,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
       length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS n_punct,
       length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
       len(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
           w -> w IN ('the','and','of','to','in','is','that','it','for','was'))) AS n_stop_en,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id
"""


def q14_quality(spark, sf):
    return textstats.quality_score(_t(spark, sf, "documents"))


SQL_Q14 = r"""
WITH s AS (
  SELECT doc_id, length(text) AS n_chars,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens,
         length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS n_punct,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
         len(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             w -> w IN ('the','and','of','to','in','is','that','it','for','was'))) AS n_stop_en
  FROM documents
)
SELECT doc_id, n_chars, n_ws_tokens,
       CASE WHEN n_ws_tokens < 10 OR n_punct * 5 > n_chars
              OR n_digits * 10 > n_chars * 3
              OR (n_stop_en = 0 AND n_ws_tokens >= 20)
            THEN 'low' ELSE 'ok' END AS quality
FROM s ORDER BY doc_id
"""


def q15_lang_id(spark, sf):
    return textstats.language_id(_t(spark, sf, "documents"))


def _sql_lang_id() -> str:
    sw = textstats.STOPWORDS
    score = {
        lang: (
            "len(list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), "
            f"w -> w IN ({', '.join(repr(w) for w in sw[lang])})))"
        )
        for lang in sw
    }
    langs = sorted(sw)
    # mirror the Spark fold: ascending lang order, strict > replaces
    best, best_score = "'und'", "0"
    for lang in langs:
        cond = f"s_{lang} > {best_score}"
        best = f"CASE WHEN {cond} THEN '{lang}' ELSE {best} END"
        best_score = f"CASE WHEN {cond} THEN s_{lang} ELSE {best_score} END"
    cols = ",\n  ".join(f"{score[lang]} AS s_{lang}" for lang in langs)
    sel = ", ".join(f"s_{lang}" for lang in langs)
    return f"""
WITH scored AS (SELECT doc_id, {cols} FROM documents)
SELECT doc_id, {best} AS lang_guess, {sel} FROM scored ORDER BY doc_id
"""


SQL_Q15 = _sql_lang_id()


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def _query_vec(spark, sf):
    row = (
        _t(spark, sf, "embeddings").filter(F.col("vec_id") == 0).select("embedding").head()
    )
    return [float(x) for x in row[0]]


def q16_similarity_topk(spark, sf):
    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    return similarity.cosine_topk(emb, _query_vec(spark, sf), k=20)


SQL_Q16 = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(embedding, qv)
             / (sqrt(list_dot_product(embedding, embedding)) * sqrt(list_dot_product(qv, qv))), 5) AS cosine
FROM embeddings, q WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id LIMIT 20
"""


def q17_embedding_neardup(spark, sf):
    emb = _t(spark, sf, "embeddings")
    return similarity.pairwise_neardups(emb, threshold=0.5).orderBy("id_a", "id_b")


SQL_Q17 = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.embedding, b.embedding)
             / (sqrt(list_dot_product(a.embedding, a.embedding)) * sqrt(list_dot_product(b.embedding, b.embedding))), 5) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.embedding, b.embedding)
      / (sqrt(list_dot_product(a.embedding, a.embedding)) * sqrt(list_dot_product(b.embedding, b.embedding))), 5) >= 0.5
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# Streaming twin + skew-salted aggregation
# ---------------------------------------------------------------------------


def q18_stream_window(spark, sf):
    from .streaming.pipeline import windowed_event_counts_batch

    ev = _t(spark, sf, "events")
    out = windowed_event_counts_batch(ev, "1 hour")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
    ).orderBy("window_start", "event_type")


SQL_Q18 = """
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""


def q19_salted_agg(spark, sf):
    """Explicit skew salting (N10): two-stage aggregate on (key, salt)."""
    ev = salt_skewed(_t(spark, sf, "events"), "event_type", n_salts=8)
    partial = ev.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("user_id")).alias("psum"),
    )
    return (
        partial.groupBy("event_type")
        .agg(F.sum("pn").alias("n_events"), F.sum("psum").alias("sum_user_id"))
        .orderBy("event_type")
    )


SQL_Q19 = """
SELECT event_type, COUNT(*) AS n_events, CAST(SUM(user_id) AS BIGINT) AS sum_user_id
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Engine / non-SQL-expressible (rows-only checks)
# ---------------------------------------------------------------------------


# Deterministic cross-engine artifacts: q20/q23 persist their inputs
# and outputs as parquet at FIXED paths so the DuckDB oracle can
# independently re-derive the expected result from the same bytes.
# Contents are seed-deterministic, so rewrites are idempotent.
ARTIFACT_DIR = "/tmp/mojap_spark_artifacts"


def _build_q20_artifacts(spark) -> tuple[str, str, str]:
    """(src, enc, dec) parquet/chunk dirs for the deterministic
    2000-doc tokens table; rebuilt idempotently on every call (the
    seed makes contents byte-stable)."""
    import shutil

    from .datagen import tokens_table
    from .operators.decode import decode_table
    from .operators.encode import encode_table

    src_dir = f"{ARTIFACT_DIR}/q20_src"
    enc_dir = f"{ARTIFACT_DIR}/q20_enc"
    dec_dir = f"{ARTIFACT_DIR}/q20_dec"
    tokens_table(spark, 2000, seed=123, avg_len=64).write.mode("overwrite").parquet(src_dir)
    shutil.rmtree(enc_dir, ignore_errors=True)
    encode_table(spark, spark.read.parquet(src_dir), enc_dir, key="doc_id", n_chunks=8)
    decode_table(spark, enc_dir).write.mode("overwrite").parquet(dec_dir)
    return src_dir, enc_dir, dec_dir


def q20_tokens_roundtrip(spark, sf):
    """Flagship: encode->decode the synthetic tokens table; the DuckDB
    oracle re-reads the persisted source AND decoded parquet and
    verifies token-array equality itself (the reference round-trip
    invariant, /root/reference/tests/test_round_trip.py:40-74, checked
    by a second engine)."""
    src_dir, _enc, dec_dir = _build_q20_artifacts(spark)
    src = spark.read.parquet(src_dir)
    dec = spark.read.parquet(dec_dir)
    j = src.alias("o").join(dec.alias("d"), "doc_id")
    return (
        j.select(
            F.col("doc_id"),
            (
                F.col("o.tokens").eqNullSafe(F.col("d.tokens"))
                & F.col("o.n_tok").eqNullSafe(F.col("d.n_tok"))
                & F.col("o.source").eqNullSafe(F.col("d.source"))
            ).alias("ok"),
        )
        .groupBy("ok")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("ok")
    )


SQL_Q20 = f"""
SELECT (o.tokens = d.tokens AND o.n_tok = d.n_tok AND o.source = d.source) AS ok,
       COUNT(*) AS n_rows
FROM read_parquet('{ARTIFACT_DIR}/q20_src/*.parquet') o
JOIN read_parquet('{ARTIFACT_DIR}/q20_dec/*.parquet') d USING (doc_id)
GROUP BY 1 ORDER BY ok
"""


def _ensure_q20_artifacts(spark) -> tuple[str, str, str]:
    """Reuse verified artifacts if present (contents are seed-stable)."""
    from .operators.encode import scan_done_chunks
    from .sources import fsio

    dirs = (
        f"{ARTIFACT_DIR}/q20_src", f"{ARTIFACT_DIR}/q20_enc", f"{ARTIFACT_DIR}/q20_dec",
    )
    try:
        ok = (
            len(scan_done_chunks(dirs[1])) == 8
            and fsio.exists(f"{dirs[0]}/_SUCCESS")
            and fsio.exists(f"{dirs[2]}/_SUCCESS")
        )
    except OSError:
        ok = False
    return dirs if ok else _build_q20_artifacts(spark)


_Q31_LO, _Q31_HI = "doc_000000000100", "doc_000000000299"


def q31_range_pruned_decode(spark, sf):
    """Manifest zone-map read path: decode ONLY the chunks whose
    [key_min, key_max] overlaps the requested doc_id range (the
    Iceberg-manifest / parquet-row-group-stats trick at the chunk
    level), exact row filter after decode. Oracle recomputes the same
    aggregate from the persisted source parquet."""
    from .operators.decode import decode_table

    _src, enc_dir, _dec = _ensure_q20_artifacts(spark)
    dec = decode_table(spark, enc_dir, key_range=(_Q31_LO, _Q31_HI))
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
        )
        .orderBy("source")
    )


SQL_Q31 = f"""
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tok
FROM read_parquet('{ARTIFACT_DIR}/q20_src/*.parquet')
WHERE doc_id BETWEEN '{_Q31_LO}' AND '{_Q31_HI}'
GROUP BY source ORDER BY source
"""


def _build_q63_artifacts(spark) -> tuple[str, str]:
    import shutil

    from .datagen import tokens_table
    from .operators.encode import encode_table

    src_dir = f"{ARTIFACT_DIR}/q63_src"
    enc_dir = f"{ARTIFACT_DIR}/q63_enc"
    shutil.rmtree(enc_dir, ignore_errors=True)
    tokens_table(spark, 1000, seed=63).write.mode("overwrite").parquet(src_dir)
    encode_table(
        spark, spark.read.parquet(src_dir), enc_dir, key="doc_id",
        n_chunks=8, cluster_by=["n_tok", "source"],
    )
    return src_dir, enc_dir


def _ensure_q63_artifacts(spark) -> tuple[str, str]:
    from .operators.encode import scan_done_chunks
    from .sources import fsio

    dirs = (f"{ARTIFACT_DIR}/q63_src", f"{ARTIFACT_DIR}/q63_enc")
    try:
        ok = (
            len(scan_done_chunks(dirs[1])) >= 4
            and fsio.exists(f"{dirs[0]}/_SUCCESS")
            and fsio.read_json(fsio.join(dirs[1], "plan.json")).get("mode")
            == "zorder"
        )
    except (OSError, KeyError, ValueError):
        ok = False
    return dirs if ok else _build_q63_artifacts(spark)


def q63_zorder_pruned_decode(spark, sf):
    """Z-ORDER clustered decode under oracle: the table is chunked on
    the Morton interleave of (n_tok, source) quantile ranks
    (plans/chunking.make_zorder_plan), then read with a conjunction
    over BOTH cluster columns — zone maps prune on each dimension,
    exact row filters after. The DuckDB oracle recomputes the
    aggregate from the untouched source parquet, so pruning that drops
    or duplicates a chunk mismatches."""
    from .operators.decode import decode_table

    src_dir, enc_dir = _ensure_q63_artifacts(spark)
    dec = decode_table(
        spark, enc_dir,
        where=[("n_tok", 0, 120), ("source", "common_crawl", "github")],
    )
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
        )
        .orderBy("source")
    )


SQL_Q63 = f"""
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tok
FROM read_parquet('{ARTIFACT_DIR}/q63_src/*.parquet')
WHERE n_tok BETWEEN 0 AND 120 AND source BETWEEN 'common_crawl' AND 'github'
GROUP BY source ORDER BY source
"""


_Q62_LO, _Q62_HI = "doc_000000000350", "doc_000000000549"


def q62_datasource_sql(spark, sf):
    """SQL over the encoded table through the Spark Python DataSource
    (sources/datasource.py): a temp view ``USING mojap_encoded`` on
    the q20 artifact table, queried with a doc_id range predicate that
    Catalyst pushes into the reader (zone-map chunk pruning) and ALSO
    re-applies post-scan — the oracle recomputes the aggregate from
    the untouched source parquet, so a pushdown that dropped or
    duplicated rows mismatches."""
    from .sources.datasource import register

    _src, enc_dir, _dec = _ensure_q20_artifacts(spark)
    register(spark)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW q62_enc "
        f"USING mojap_encoded OPTIONS (path '{enc_dir}')"
    )
    return spark.sql(
        f"""
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS sum_tok
        FROM q62_enc
        WHERE doc_id BETWEEN '{_Q62_LO}' AND '{_Q62_HI}'
        GROUP BY source ORDER BY source
        """
    )


SQL_Q62 = f"""
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tok
FROM read_parquet('{ARTIFACT_DIR}/q20_src/*.parquet')
WHERE doc_id BETWEEN '{_Q62_LO}' AND '{_Q62_HI}'
GROUP BY source ORDER BY source
"""


def q32_lsh_neardup_pairs(spark, sf):
    """Embedding near-dup mining, the 100-TB shape: within-bucket
    pairs only (equi-join on the hyperplane signature), exact cosine
    filter. Oracle replicates buckets from the same plane literals."""
    emb = _t(spark, sf, "embeddings")
    return similarity.lsh_neardup_pairs(
        emb, dim=64, threshold=0.4, n_planes=2
    ).orderBy("id_a", "id_b")


def _sql_lsh_neardup(n_planes: int = 2, dim: int = 64, seed: int = 42,
                     threshold: float = 0.4) -> str:
    planes = similarity._hyperplanes(n_planes, dim, seed).astype("float64")
    plane_rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(j, ", ".join(repr(float(x)) for x in planes[j]))
        for j in range(n_planes)
    )
    return f"""
WITH planes(j, p) AS (VALUES {plane_rows}),
bucketed AS (
  SELECT e.vec_id, e.embedding,
         CAST(SUM(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), p) > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e, planes GROUP BY e.vec_id, e.embedding
),
pairs AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         round(list_dot_product(x.embedding, y.embedding)
               / (sqrt(list_dot_product(x.embedding, x.embedding))
                  * sqrt(list_dot_product(y.embedding, y.embedding))), 5) AS cosine
  FROM bucketed x JOIN bucketed y
    ON x.bucket = y.bucket AND x.vec_id < y.vec_id
)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= {threshold}
ORDER BY id_a, id_b
"""


SQL_Q32 = _sql_lsh_neardup()


def q34_manifest_lineage(spark, sf):
    """Lineage manifest invariant (N12): the per-chunk JSON sidecars
    written by executors and the consolidated manifest.parquet must
    agree exactly. Spark side rebuilds rows FROM THE SIDECARS; the
    oracle reads the consolidated parquet — a cross-artifact equality
    check of the commit protocol, not a pass-through."""
    from .operators.encode import scan_done_chunks

    _src, enc_dir, _dec = _ensure_q20_artifacts(spark)
    rows = [
        (int(m["chunk_id"]), int(m["n_rows"]), int(m["n_cols"]),
         int(m["in_bytes"]), int(m["out_bytes"]), m["crc32"], m["codecs"])
        for m in scan_done_chunks(enc_dir).values()
    ]
    df = spark.createDataFrame(
        rows,
        "chunk_id int, n_rows bigint, n_cols int, in_bytes bigint, "
        "out_bytes bigint, crc32 string, codecs string",
    )
    return df.orderBy("chunk_id")


SQL_Q34 = f"""
SELECT chunk_id, n_rows, n_cols, in_bytes, out_bytes, crc32, codecs
FROM read_parquet('{ARTIFACT_DIR}/q20_enc/manifest.parquet/*.parquet')
ORDER BY chunk_id
"""


def q35_winnow_fingerprints(spark, sf):
    """Winnowing (MOSS) document fingerprints: k-gram rolling hashes,
    window minima, distinct — the classic fingerprint sketch; oracle
    recomputes every window minimum in SQL from the same md5-prefix
    gram hash."""
    return textstats.winnow_fingerprints(
        _t(spark, sf, "documents"), k=5, w=4
    ).orderBy("id", "fp")


SQL_Q35 = """
WITH docs AS (
  SELECT doc_id AS id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
c AS (SELECT id, t, greatest(length(t) - 4, 1) AS m FROM docs),
g AS (
  SELECT id,
         [CAST('0x' || substr(md5(substr(t, CAST(i AS INT), 5)), 1, 7) AS BIGINT)
          FOR i IN range(1, m + 1)] AS hs
  FROM c
),
wins AS (
  SELECT id,
         list_distinct([list_aggregate(hs[j:j+3], 'min')
                        FOR j IN range(1, greatest(len(hs) - 3, 1) + 1)]) AS fps
  FROM g
)
SELECT DISTINCT id, fp
FROM (SELECT id, UNNEST(fps) AS fp FROM wins) u
ORDER BY id, fp
"""


def q33_ivf_ann(spark, sf):
    """IVF ANN: MLlib k-means coarse quantizer (the only stochastic
    step; centroids persisted as an artifact), then probe the 2
    nearest lists and re-rank exactly. The oracle re-derives EVERY
    assignment and the probe set from the persisted centroids — the
    same ||v-c||^2 argmin formula, ties to lowest cid."""
    import pandas as pd

    emb = _t(spark, sf, "embeddings")
    cents = similarity.ivf_fit_centroids(emb.filter(F.col("vec_id") != 0), k=16)
    cdf = spark.createDataFrame(
        pd.DataFrame(
            {"cid": range(len(cents)), "centroid": [c.tolist() for c in cents]}
        )
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{ARTIFACT_DIR}/q33_centroids")
    persisted = spark.read.parquet(f"{ARTIFACT_DIR}/q33_centroids").orderBy("cid").collect()
    import numpy as np

    centroids = np.array([r.centroid for r in persisted], dtype="float64")
    return similarity.ivf_search(
        emb.filter(F.col("vec_id") != 0), centroids, _query_vec(spark, sf),
        k=10, nprobe=2,
    )


SQL_Q33 = f"""
WITH c AS (
  SELECT cid, CAST(centroid AS DOUBLE[]) AS centroid
  FROM read_parquet('{ARTIFACT_DIR}/q33_centroids/*.parquet')
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
qd AS (
  SELECT cid,
         list_dot_product(qv, qv) - 2 * list_dot_product(qv, centroid)
           + list_dot_product(centroid, centroid) AS d2
  FROM q, c
),
probes AS (SELECT cid FROM qd ORDER BY d2, cid LIMIT 2),
dists AS (
  SELECT e.vec_id, e.embedding, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                    - 2 * list_dot_product(CAST(e.embedding AS DOUBLE[]), centroid)
                    + list_dot_product(centroid, centroid),
                    c.cid
         ) AS rn
  FROM embeddings e, c WHERE e.vec_id <> 0
),
cand AS (
  SELECT vec_id, embedding FROM dists
  WHERE rn = 1 AND cid IN (SELECT cid FROM probes)
)
SELECT vec_id,
       round(list_dot_product(embedding, qv)
             / (sqrt(list_dot_product(embedding, embedding)) * sqrt(list_dot_product(qv, qv))), 5) AS cosine
FROM cand, q ORDER BY cosine DESC, vec_id LIMIT 10
"""


def q21_simhash(spark, sf):
    """Portable SimHash: md5-derived word bits -> exact DuckDB oracle
    (the xxhash64-based simhash64 stays the prod-default variant)."""
    return dedup.simhash_bits(_t(spark, sf, "documents")).orderBy("id")


def _sql_simhash() -> str:
    votes = ",\n    ".join(
        "SUM(CASE WHEN ({src} >> {sh}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}".format(
            src="lo" if i < 32 else "hi", sh=i if i < 32 else i - 32, i=i
        )
        for i in range(64)
    )
    chars = " || ".join(
        f"(CASE WHEN b{i} > 0 THEN '1' ELSE '0' END)" for i in range(63, -1, -1)
    )
    return f"""
WITH docs AS (
  SELECT doc_id AS id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
words AS (
  SELECT id, w FROM docs, UNNEST(string_split(t, ' ')) AS u(w) WHERE length(w) > 0
),
h AS (
  SELECT id,
         CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS hi,
         CAST('0x' || substr(md5(w), 9, 8) AS BIGINT) AS lo
  FROM words
),
v AS (SELECT id, {votes} FROM h GROUP BY id)
SELECT id, {chars} AS simhash_bits FROM v ORDER BY id
"""


SQL_Q21 = _sql_simhash()


def q22_ann_lsh(spark, sf):
    """RP-LSH ANN with Hamming-1 multiprobe; the DuckDB oracle gets the
    deterministic hyperplane matrix as literals and replicates bucket
    assignment + probe set + exact re-rank."""
    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    return similarity.ann_search(
        emb, _query_vec(spark, sf), k=10, n_planes=4, probe_radius=1
    )


def _sql_ann(n_planes: int = 4, dim: int = 64, seed: int = 42, k: int = 10) -> str:
    planes = similarity._hyperplanes(n_planes, dim, seed).astype("float64")
    plane_rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(j, ", ".join(repr(float(x)) for x in planes[j]))
        for j in range(n_planes)
    )
    masks = ", ".join(f"({m})" for m in [0] + [1 << j for j in range(n_planes)])
    return f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
planes(j, p) AS (VALUES {plane_rows}),
qb AS (
  SELECT CAST(SUM(CASE WHEN list_dot_product(qv, p) > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS b
  FROM q, planes
),
bucketed AS (
  SELECT e.vec_id, e.embedding,
         CAST(SUM(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), p) > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e, planes WHERE e.vec_id <> 0 GROUP BY e.vec_id, e.embedding
),
probes AS (SELECT xor(qb.b, m.m) AS pb FROM qb, (VALUES {masks}) AS m(m)),
cand AS (SELECT vec_id, embedding FROM bucketed WHERE bucket IN (SELECT pb FROM probes))
SELECT vec_id,
       round(list_dot_product(embedding, qv)
             / (sqrt(list_dot_product(embedding, embedding)) * sqrt(list_dot_product(qv, qv))), 5) AS cosine
FROM cand, q ORDER BY cosine DESC, vec_id LIMIT {k}
"""


SQL_Q22 = _sql_ann()


def q23_multimodal_features(spark, sf):
    """Multimodal plumbing, oracled for its SQL-expressible part: the
    persisted media table's payload bytes are measured by the
    mapInPandas UDF on the Spark side and by octet_length in DuckDB.
    (Feature values aren't SQL-expressible; the REAL decode paths are
    covered by q51 and TestMultimodal's pixel/sample-exact tests.)"""
    from .operators.multimodal import extract_features, synthetic_media_table

    media_dir = f"{ARTIFACT_DIR}/q23_media"
    synthetic_media_table(spark, n_rows=48).write.mode("overwrite").parquet(media_dir)
    media = spark.read.parquet(media_dir)
    return extract_features(media).select("media_id", "n_bytes").orderBy("media_id")


SQL_Q23 = f"""
SELECT media_id, CAST(octet_length(payload) AS BIGINT) AS n_bytes
FROM read_parquet('{ARTIFACT_DIR}/q23_media/*.parquet')
ORDER BY media_id
"""


# ---------------------------------------------------------------------------
# Additional relational coverage: set ops, rollup, as-of join
# ---------------------------------------------------------------------------


def q24_set_ops(spark, sf):
    """Set operations: customers with orders vs high-balance customers."""
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer")
    with_orders = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    high_bal = cust.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    both = with_orders.intersect(high_bal).withColumn("grp", F.lit("both"))
    only_orders = with_orders.exceptAll(high_bal).withColumn("grp", F.lit("orders_only"))
    either = with_orders.union(high_bal).distinct().withColumn("grp", F.lit("either"))
    return (
        both.unionAll(only_orders).unionAll(either)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("grp")
    )


SQL_Q24 = """
WITH with_orders AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
high_bal AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000),
u AS (
  SELECT custkey, 'both' AS grp FROM (SELECT custkey FROM with_orders INTERSECT SELECT custkey FROM high_bal)
  UNION ALL
  SELECT custkey, 'orders_only' AS grp FROM (SELECT custkey FROM with_orders EXCEPT ALL SELECT custkey FROM high_bal)
  UNION ALL
  SELECT custkey, 'either' AS grp FROM (SELECT custkey FROM with_orders UNION SELECT custkey FROM high_bal)
)
SELECT grp, COUNT(*) AS n FROM u GROUP BY grp ORDER BY grp
"""


def q25_rollup(spark, sf):
    """ROLLUP aggregation over (returnflag, linestatus) with grouping ids."""
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("l_quantity"))).alias("qty_x100"),
            F.grouping_id().alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


SQL_Q25 = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_x100,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def q26_asof_join(spark, sf):
    """As-of join (Spark has no native one): for each 'purchase' event,
    the user's most recent prior-or-equal 'login' event. Implemented
    with the scalable union+window pattern; the oracle uses DuckDB's
    native ASOF JOIN — two independent algorithms cross-validated."""
    ev = _t(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts")
    )
    logins = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("login_id"), F.col("ts")
    )
    tagged = purchases.withColumn("is_p", F.lit(1)).withColumn(
        "login_id", F.lit(None).cast("long")
    ).unionByName(
        logins.withColumn("is_p", F.lit(0)).withColumn(
            "purchase_id", F.lit(None).cast("long")
        ),
        allowMissingColumns=False,
    )
    # order logins before purchases at equal ts (asof <=)
    w = Window.partitionBy("user_id").orderBy("ts", "is_p")
    filled = tagged.withColumn(
        "last_login",
        F.last("login_id", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        filled.filter(F.col("is_p") == 1)
        .filter(F.col("last_login").isNotNull())
        .select("user_id", "purchase_id", F.col("last_login").alias("login_id"))
        .orderBy("user_id", "purchase_id")
    )


SQL_Q26 = """
SELECT p.user_id, p.event_id AS purchase_id, l.event_id AS login_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') l
  ON p.user_id = l.user_id AND p.ts >= l.ts
ORDER BY p.user_id, purchase_id
"""


def q27_window_suite(spark, sf):
    """Window-function coverage: rank/dense_rank/row_number/ntile/lag
    running sums over customer order history."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price_c = _cents(F.col("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(
            Window.partitionBy("o_custkey").orderBy(price_c.desc(), "o_orderkey")
        ).alias("price_rank"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.sum(price_c).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("running_x100"),
    )


SQL_Q27 = """
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS rn,
       rank() OVER (PARTITION BY o_custkey
                    ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey) AS price_rank,
       ntile(4) OVER w AS quartile,
       lag(o_orderkey) OVER w AS prev_order,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_x100
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q28_dup_components(spark, sf):
    """Connected components over the near-dup candidate graph (the
    at-scale dedup closer): iterative min-label propagation, cross-
    validated against a DuckDB recursive-CTE transitive closure."""
    corpus = _duplicated_docs(spark, sf, near=True)
    pairs = dedup.ngram_jaccard_pairs(corpus, "text", "doc_id", n=3, threshold=0.6)
    labels = dedup.connected_components(pairs)
    return (
        labels.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("size"), F.max("id").alias("max_id"))
        .orderBy("comp")
    )


SQL_Q28 = f"""
WITH RECURSIVE corpus AS ({_SQL_DUP_DOCS_NEAR}),
docs AS (
  SELECT doc_id AS id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM corpus
),
words AS (SELECT id, string_split(t, ' ') AS ws FROM docs),
grams AS (
  SELECT DISTINCT id, array_to_string(ws[i:i+2], ' ') AS shingle
  FROM words, UNNEST(generate_series(1, greatest(len(ws) - 2, 1))) AS u(i)
  WHERE length(array_to_string(ws[i:i+2], ' ')) > 0
),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM grams GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
  WHERE n_inter >= (sa.n_sh + sb.n_sh - n_inter) * 0.6
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b AS a, id_a AS b FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS id, LEAST(a, MIN(b)) AS comp
  FROM reach GROUP BY a
)
SELECT comp, COUNT(*) AS size, CAST(MAX(id) AS BIGINT) AS max_id
FROM comp GROUP BY comp ORDER BY comp
"""


def q46_dedup_canonicalize(spark, sf):
    """Materialized near-dup dedup: connected components over the
    Jaccard candidate graph, then keep ONE representative per
    component (the min-id label) plus every unpaired document — the
    'drop duplicates, keep one' step a real corpus-prep job ends
    with. Oracle recomputes the closure with a recursive CTE and
    anti-selects non-representatives."""
    corpus = _duplicated_docs(spark, sf, near=True)
    pairs = dedup.ngram_jaccard_pairs(corpus, "text", "doc_id", n=3, threshold=0.6)
    labels = dedup.connected_components(pairs)
    surv = dedup.canonicalize_duplicates(corpus, labels, "doc_id")
    return surv.select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    ).orderBy("doc_id")


_SQL_COMP_CTE = """
words AS (SELECT id, string_split(t, ' ') AS ws FROM docs),
grams AS (
  SELECT DISTINCT id, array_to_string(ws[i:i+2], ' ') AS shingle
  FROM words, UNNEST(generate_series(1, greatest(len(ws) - 2, 1))) AS u(i)
  WHERE length(array_to_string(ws[i:i+2], ' ')) > 0
),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM grams GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
  WHERE n_inter >= (sa.n_sh + sb.n_sh - n_inter) * 0.6
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b AS a, id_a AS b FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS id, LEAST(a, MIN(b)) AS comp
  FROM reach GROUP BY a
)
"""


SQL_Q46 = f"""
WITH RECURSIVE corpus AS ({_SQL_DUP_DOCS_NEAR}),
docs AS (
  SELECT doc_id AS id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM corpus
),
{_SQL_COMP_CTE}
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
FROM corpus
WHERE doc_id NOT IN (SELECT id FROM comp WHERE id != comp)
ORDER BY doc_id
"""


def _pii_corpus(spark, sf):
    """documents with deterministic synthetic PII appended: every 7th
    doc gains an email + private IP, every 13th a phone + public IP
    (multiples of 91 get both)."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit(" reach me at user7@example.org or 10.0.0.7"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.lit(" call +123 456-7890 from 192.168.13.13"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


_SQL_PII_CORPUS = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' reach me at user7@example.org or 10.0.0.7'
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' call +123 456-7890 from 192.168.13.13'
                 ELSE '' END AS text
  FROM documents
"""


def q47_pii_redaction(spark, sf):
    """PII scrub over a corpus with deterministic synthetic PII:
    per-doc email/IPv4/phone match counts plus the md5 of the fully
    redacted text — the digest proves the replacement output is
    byte-identical across engines, not just the counts."""
    red = textstats.redact_pii(_pii_corpus(spark, sf))
    return red.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.md5("redacted").alias("digest"),
    ).orderBy("doc_id")


SQL_Q47 = f"""
WITH corpus AS ({_SQL_PII_CORPUS})
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT)
         AS n_email,
       CAST(len(regexp_extract_all(text,
         '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT)
         AS n_ipv4,
       CAST(len(regexp_extract_all(text,
         '\\+?\\d{{3}}[- ]\\d{{3}}[- ]\\d{{4}}')) AS BIGINT) AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
         '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
         '\\+?\\d{{3}}[- ]\\d{{3}}[- ]\\d{{4}}', '<PHONE>', 'g')) AS digest
FROM corpus ORDER BY doc_id
"""


def q29_training_pipeline(spark, sf):
    """Composite training-data pipeline in one plan: quality gate ->
    exact dedup (keep lowest doc_id per fingerprint) -> per-source
    token accounting. The shape of a real corpus-prep job."""
    d = _t(spark, sf, "documents")
    corpus = d.select("doc_id", "source", "text").unionAll(
        d.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "source", "text")
    )
    stats = textstats.text_stats(corpus, "text", "doc_id")
    quality = (
        (F.col("n_ws_tokens") >= 10)
        & (F.col("n_punct") * 5 <= F.col("n_chars"))
        & (F.col("n_digits") * 10 <= F.col("n_chars") * 3)
        & ~((F.col("n_stop_en") == 0) & (F.col("n_ws_tokens") >= 20))
    )
    kept = stats.filter(quality)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    deduped = kept.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return (
        deduped.join(corpus.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws_tokens").alias("total_ws_tokens"),
            F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        )
        .orderBy("source")
    )


SQL_Q29 = rf"""
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL SELECT doc_id + 1000000 AS doc_id, source, text FROM documents
),
stats AS (
  SELECT doc_id, source,
         length(text) AS n_chars,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
         length(text) - length(regexp_replace(text, '[!-/:-@\[-`{{-~]', '', 'g')) AS n_punct,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
         len(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             w -> w IN ('the','and','of','to','in','is','that','it','for','was'))) AS n_stop_en,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
  FROM corpus
),
kept AS (
  SELECT * FROM stats
  WHERE n_ws_tokens >= 10 AND n_punct * 5 <= n_chars
    AND n_digits * 10 <= n_chars * 3
    AND NOT (n_stop_en = 0 AND n_ws_tokens >= 20)
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_ws_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens
FROM deduped GROUP BY source ORDER BY source
"""


def q30_pivot(spark, sf):
    """Pivot: order counts + revenue cents per status, one row per
    priority (portable CASE-pivot in the oracle)."""
    o = _t(spark, sf, "orders")
    price_c = _cents(F.col("o_totalprice"))
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(price_c))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("rev_f_x100"),
            F.coalesce(F.col("O"), F.lit(0)).alias("rev_o_x100"),
            F.coalesce(F.col("P"), F.lit(0)).alias("rev_p_x100"),
        )
        .orderBy("o_orderpriority")
    )


SQL_Q30 = """
SELECT o_orderpriority,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS rev_f_x100,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS rev_o_x100,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS rev_p_x100
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Training-batch preparation: sequence packing + token statistics +
# benchmark contamination (round 3)
# ---------------------------------------------------------------------------


def q36_pack_sequences(spark, sf):
    """Concat-and-split packing of the persisted deterministic tokens
    table into 512-token training sequences (the GPT-style pretraining
    dataloader view). The DuckDB oracle re-derives every sequence by
    flattening the token stream with ROW_NUMBER over (doc_id, ordinal)
    and grouping by pos // 512; both sides emit an md5 digest of the
    comma-joined token list so sequence CONTENT (not just counts) is
    hash-compared."""
    from .operators.packing import pack_sequences

    src_dir, _, _ = _ensure_q20_artifacts(spark)
    src = spark.read.parquet(src_dir)
    p = pack_sequences(spark, src, 512)
    return p.select(
        "seq_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_docs").alias("n_docs"),
        F.md5(F.array_join("tokens", ",")).alias("digest"),
    ).orderBy("seq_id")


SQL_Q36 = f"""
WITH flat AS (
  SELECT d.doc_id, d.tokens[i] AS token,
         ROW_NUMBER() OVER (ORDER BY d.doc_id, i) - 1 AS pos
  FROM read_parquet('{ARTIFACT_DIR}/q20_src/*.parquet') d,
       UNNEST(generate_series(1, len(d.tokens))) AS u(i)
)
SELECT CAST(pos // 512 AS BIGINT) AS seq_id,
       COUNT(*) AS n_tokens,
       COUNT(DISTINCT doc_id) AS n_docs,
       md5(string_agg(CAST(token AS VARCHAR), ',' ORDER BY pos)) AS digest
FROM flat
GROUP BY 1
ORDER BY seq_id
"""


def q37_token_vocab(spark, sf):
    """Top-50 token frequency histogram over the persisted tokens
    table (explode -> partially-aggregated count shuffle), count-desc
    with token-asc tiebreak."""
    from .operators.packing import token_vocab

    src_dir, _, _ = _ensure_q20_artifacts(spark)
    return token_vocab(spark.read.parquet(src_dir), k=50)


SQL_Q37 = f"""
SELECT token, COUNT(*) AS n
FROM (
  SELECT unnest(tokens) AS token
  FROM read_parquet('{ARTIFACT_DIR}/q20_src/*.parquet')
)
GROUP BY token
ORDER BY n DESC, token
LIMIT 50
"""


def q38_contamination(spark, sf):
    """Benchmark-contamination report: a deterministic synthetic eval
    set (every 17th document; even ids keep their text = contaminated,
    odd ids get md5-derived guaranteed-novel words = clean) checked
    for word-trigram overlap against the full documents corpus. The
    distinct train shingles act as the dictionary side of a semi-join
    — no O(train x eval) pairing."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    ev_base = d.filter(F.col("doc_id") % 17 == 0)
    clean_text = F.concat_ws(
        " ",
        F.lit("zz"),
        F.md5(F.col("text")),
        F.md5(F.concat(F.col("text"), F.lit("x"))),
        F.md5(F.concat(F.col("text"), F.lit("y"))),
    )
    eval_df = ev_base.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(clean_text)
        .alias("text"),
    )
    return (
        dedup.ngram_contamination(d, eval_df, n=3)
        .select(
            "eval_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
        )
        .orderBy("eval_id")
    )


SQL_Q38 = """
WITH train_docs AS (
  SELECT doc_id AS id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
eval_docs AS (
  SELECT doc_id + 2000000 AS id,
         trim(regexp_replace(lower(
           CASE WHEN doc_id % 2 = 0 THEN text
                ELSE 'zz ' || md5(text) || ' ' || md5(text || 'x') || ' ' || md5(text || 'y')
           END), '\\s+', ' ', 'g')) AS t
  FROM documents WHERE doc_id % 17 = 0
),
train_words AS (SELECT id, string_split(t, ' ') AS ws FROM train_docs),
eval_words AS (SELECT id, string_split(t, ' ') AS ws FROM eval_docs),
train_grams AS (
  SELECT DISTINCT array_to_string(ws[i:i+2], ' ') AS shingle
  FROM train_words, UNNEST(generate_series(1, greatest(len(ws) - 2, 1))) AS u(i)
  WHERE length(array_to_string(ws[i:i+2], ' ')) > 0
),
eval_grams AS (
  SELECT DISTINCT id, array_to_string(ws[i:i+2], ' ') AS shingle
  FROM eval_words, UNNEST(generate_series(1, greatest(len(ws) - 2, 1))) AS u(i)
  WHERE length(array_to_string(ws[i:i+2], ' ')) > 0
)
SELECT e.id AS eval_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
FROM eval_grams e LEFT JOIN train_grams t ON e.shingle = t.shingle
GROUP BY e.id
ORDER BY eval_id
"""


def q40_column_pruned_decode(spark, sf):
    """Per-COLUMN zone-map read path (q31's generalization): decode
    only the chunks whose sidecar col_stats[n_tok] range overlaps the
    predicate — an Iceberg column-stats pruned scan on a NON-key
    column — then the exact row filter. Oracle recomputes the same
    aggregate from the persisted source parquet with a plain WHERE."""
    from .operators.decode import decode_table

    _src, enc_dir, _dec = _ensure_q20_artifacts(spark)
    dec = decode_table(spark, enc_dir, where=("n_tok", 100, 200))
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
        )
        .orderBy("source")
    )


SQL_Q40 = f"""
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tok
FROM read_parquet('{ARTIFACT_DIR}/q20_src/*.parquet')
WHERE n_tok BETWEEN 100 AND 200
GROUP BY source ORDER BY source
"""


def q39_hash_split(spark, sf):
    """Deterministic leakage-safe train/val split of the documents
    table (membership = pure function of the id hash), summarized per
    split. md5 mode so the DuckDB oracle reproduces every assignment."""
    from .operators.packing import hash_split

    d = _t(spark, sf, "documents").select("doc_id", "n_chars")
    s = hash_split(d, "doc_id", val_pct=5, hash_mode="md5")
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


SQL_Q39 = """
SELECT CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 100 < 5
            THEN 'val' ELSE 'train' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
ORDER BY split
"""


def _build_q41_artifacts(spark) -> tuple[str, str]:
    """(src, dec) parquet dirs for the struct-bearing table: the
    deterministic tokens table extended with a nested ``meta`` struct
    (string + int + int-array fields, nulls every 7th row), pushed
    through encode -> decode. Oracle-side, DuckDB reads the SOURCE and
    the DECODED parquet independently — agreement proves the struct
    codec round-trip with a second engine."""
    import shutil

    from .datagen import tokens_table
    from .operators.decode import decode_table
    from .operators.encode import encode_table

    src_dir = f"{ARTIFACT_DIR}/q41_src"
    enc_dir = f"{ARTIFACT_DIR}/q41_enc"
    dec_dir = f"{ARTIFACT_DIR}/q41_dec"
    src = tokens_table(spark, 1500, seed=321, avg_len=32).withColumn(
        "meta",
        F.when(
            F.col("n_tok") % 7 != 0,
            F.struct(
                F.col("source").alias("src"),
                (F.col("n_tok") * 2).cast("long").alias("dbl"),
                F.array(F.lit(1), F.col("n_tok")).alias("arr"),
            ),
        ),
    )
    src.write.mode("overwrite").parquet(src_dir)
    shutil.rmtree(enc_dir, ignore_errors=True)
    encode_table(spark, spark.read.parquet(src_dir), enc_dir, key="doc_id", n_chunks=4)
    decode_table(spark, enc_dir).write.mode("overwrite").parquet(dec_dir)
    return src_dir, dec_dir


def _ensure_q41_artifacts(spark) -> tuple[str, str]:
    from .operators.encode import scan_done_chunks
    from .sources import fsio

    dirs = (f"{ARTIFACT_DIR}/q41_src", f"{ARTIFACT_DIR}/q41_dec")
    try:
        ok = (
            len(scan_done_chunks(f"{ARTIFACT_DIR}/q41_enc")) == 4
            and fsio.exists(f"{dirs[0]}/_SUCCESS")
            and fsio.exists(f"{dirs[1]}/_SUCCESS")
        )
    except OSError:
        ok = False
    return dirs if ok else _build_q41_artifacts(spark)


def q41_struct_roundtrip(spark, sf):
    """Struct-column codec round-trip (the nested-type capability the
    reference warns-and-skips, caster.py:398-402): aggregate the
    DECODED table by a struct field; the oracle computes the same
    aggregate from the SOURCE parquet — equal results mean
    decode(encode(x)) preserved every struct field, null slots
    included, as certified by a second engine."""
    _src, dec_dir = _ensure_q41_artifacts(spark)
    dec = spark.read.parquet(dec_dir)
    return (
        dec.groupBy(F.col("meta.src").alias("src_grp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("meta.dbl").cast("long").alias("sum_dbl"),
            F.sum(F.element_at("meta.arr", 2)).cast("long").alias("sum_arr2"),
        )
        .orderBy(F.col("src_grp").asc_nulls_first())
    )


SQL_Q41 = f"""
SELECT struct_extract(meta, 'src') AS src_grp,
       COUNT(*) AS n_docs,
       CAST(SUM(struct_extract(meta, 'dbl')) AS BIGINT) AS sum_dbl,
       CAST(SUM(struct_extract(meta, 'arr')[2]) AS BIGINT) AS sum_arr2
FROM read_parquet('{ARTIFACT_DIR}/q41_src/*.parquet')
GROUP BY 1 ORDER BY src_grp NULLS FIRST
"""


def _build_q45_artifacts(spark) -> tuple[str, str]:
    """(src, dec) parquet dirs for the decimal-bearing table: the
    deterministic tokens table extended with a nullable decimal(18,4)
    and a high-precision decimal(38,6) column, pushed through
    encode -> decode. Oracle-side, DuckDB reads SOURCE and DECODED
    parquet independently — agreement certifies the decimal word-plane
    codec round-trip with a second engine."""
    import shutil

    from .datagen import tokens_table
    from .operators.decode import decode_table
    from .operators.encode import encode_table

    src_dir = f"{ARTIFACT_DIR}/q45_src"
    enc_dir = f"{ARTIFACT_DIR}/q45_enc"
    dec_dir = f"{ARTIFACT_DIR}/q45_dec"
    src = (
        tokens_table(spark, 1500, seed=99, avg_len=32)
        .withColumn(
            "price",
            F.when(
                F.col("n_tok") % 11 != 0,
                (F.col("n_tok") * 1.37).cast("decimal(18,4)"),
            ),
        )
        .withColumn(
            "big", (F.col("n_tok") * 12345678901234).cast("decimal(38,6)")
        )
    )
    src.write.mode("overwrite").parquet(src_dir)
    shutil.rmtree(enc_dir, ignore_errors=True)
    encode_table(spark, spark.read.parquet(src_dir), enc_dir, key="doc_id", n_chunks=4)
    decode_table(spark, enc_dir).write.mode("overwrite").parquet(dec_dir)
    return src_dir, dec_dir


def _ensure_q45_artifacts(spark) -> tuple[str, str]:
    from .operators.encode import scan_done_chunks
    from .sources import fsio

    dirs = (f"{ARTIFACT_DIR}/q45_src", f"{ARTIFACT_DIR}/q45_dec")
    try:
        ok = (
            len(scan_done_chunks(f"{ARTIFACT_DIR}/q45_enc")) == 4
            and fsio.exists(f"{dirs[0]}/_SUCCESS")
            and fsio.exists(f"{dirs[1]}/_SUCCESS")
        )
    except OSError:
        ok = False
    return dirs if ok else _build_q45_artifacts(spark)


def q45_decimal_roundtrip(spark, sf):
    """Decimal-column codec round-trip: aggregate the DECODED table —
    exact scaled-integer sum of the nullable decimal(18,4), null
    count, and min/max of the decimal(38,6) as canonical strings —
    while the oracle computes the same from the SOURCE parquet. Equal
    results mean decode(encode(x)) preserved every decimal value and
    null slot, certified by a second engine."""
    _src, dec_dir = _ensure_q45_artifacts(spark)
    dec = spark.read.parquet(dec_dir)
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("price").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null_price"),
            F.sum((F.col("price") * 10000).cast("long")).alias("price_scaled_sum"),
            F.min("big").cast("string").alias("big_min"),
            F.max("big").cast("string").alias("big_max"),
        )
        .orderBy("source")
    )


SQL_Q45 = f"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN price IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_price,
       CAST(SUM(CAST(price * 10000 AS BIGINT)) AS BIGINT) AS price_scaled_sum,
       CAST(MIN(big) AS VARCHAR) AS big_min,
       CAST(MAX(big) AS VARCHAR) AS big_max
FROM read_parquet('{ARTIFACT_DIR}/q45_src/*.parquet')
GROUP BY source ORDER BY source
"""


def q42_repetition_signals(spark, sf):
    """Gopher/MassiveText within-document repetition signals over the
    documents table: top-word character share and duplicate-trigram
    occurrence counts, all-integer output. One explode + doc-keyed
    aggregations; no corpus-wide window or self-join."""
    return textstats.repetition_signals(
        _t(spark, sf, "documents"), ngram_n=3
    ).orderBy("id")


SQL_Q42 = """
WITH docs AS (
  SELECT doc_id AS id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
words AS (SELECT id, unnest(string_split(t, ' ')) AS w FROM docs),
wf AS (
  SELECT id, w, COUNT(*) AS n FROM words WHERE length(w) > 0 GROUP BY id, w
),
top AS (
  SELECT id, w AS top_word, CAST(n * length(w) AS BIGINT) AS top_word_chars,
         row_number() OVER (PARTITION BY id ORDER BY n DESC, w) AS rn
  FROM wf
),
tot AS (
  SELECT id, CAST(SUM(n) AS BIGINT) AS n_words,
         CAST(SUM(n * length(w)) AS BIGINT) AS total_word_chars
  FROM wf GROUP BY id
),
ws AS (SELECT id, string_split(t, ' ') AS ws FROM docs),
grams AS (
  SELECT id, array_to_string(ws[i:i+2], ' ') AS g
  FROM ws, UNNEST(generate_series(1, greatest(len(ws) - 2, 1))) AS u(i)
  WHERE length(array_to_string(ws[i:i+2], ' ')) > 0
),
gs AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct_grams
  FROM grams GROUP BY id
)
SELECT tot.id, n_words, top_word, top_word_chars, total_word_chars,
       n_grams, n_distinct_grams
FROM tot
JOIN top ON top.id = tot.id AND top.rn = 1
JOIN gs ON gs.id = tot.id
ORDER BY tot.id
"""


def q43_oov_rate(spark, sf):
    """Per-document out-of-vocabulary counts vs the top-50 token vocab
    (broadcast membership join on the exploded token stream, then one
    per-doc partial-agg count)."""
    from .operators.packing import oov_against_vocab, token_vocab

    src_dir, _, _ = _ensure_q20_artifacts(spark)
    toks = spark.read.parquet(src_dir)
    return oov_against_vocab(toks, token_vocab(toks, k=50)).orderBy("id")


SQL_Q43 = f"""
WITH vocab AS (
  SELECT token FROM (
    SELECT unnest(tokens) AS token
    FROM read_parquet('{ARTIFACT_DIR}/q20_src/*.parquet')
  ) GROUP BY token ORDER BY COUNT(*) DESC, token LIMIT 50
),
tok AS (
  SELECT doc_id AS id, unnest(tokens) AS token
  FROM read_parquet('{ARTIFACT_DIR}/q20_src/*.parquet')
)
SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tok,
       CAST(SUM(CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov
FROM tok LEFT JOIN vocab ON tok.token = vocab.token
GROUP BY id ORDER BY id
"""


def q44_stratified_sample(spark, sf):
    """Deterministic 5-per-source stratified sample: md5-hash-order
    row_number within each stratum (engine-portable selection; the
    rank makes nested subsamples free)."""
    from .operators.sampling import stratified_sample

    s = stratified_sample(_t(spark, sf, "documents"), "source", 5, id_col="doc_id")
    return s.select(
        "doc_id", "source", F.col("sample_rank").cast("long").alias("sample_rank")
    ).orderBy("source", "sample_rank")


SQL_Q44 = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS sample_rank
  FROM documents
)
SELECT doc_id, source, CAST(sample_rank AS BIGINT) AS sample_rank
FROM r WHERE sample_rank <= 5
ORDER BY source, sample_rank
"""


def _build_q48_artifacts(spark) -> tuple[str, str]:
    """(src, enc) dirs for the typed-zone-map table: the deterministic
    tokens table extended with a doc_id-monotone decimal(18,4)
    ``price`` and a doc_id-monotone ``ts`` timestamp, encoded into 6
    range chunks — so each chunk's TAGGED sidecar zone map ([min, max,
    "dec"/"ts"], operators/encode._col_min_max) covers a disjoint
    slice and predicate decodes prune whole chunk files."""
    import shutil

    from .datagen import tokens_table
    from .operators.encode import encode_table

    src_dir = f"{ARTIFACT_DIR}/q48_src"
    enc_dir = f"{ARTIFACT_DIR}/q48_enc"
    idx = F.substring("doc_id", 5, 12).cast("long")
    src = (
        tokens_table(spark, 2000, seed=555, avg_len=32)
        .withColumn("price", (idx.cast("decimal(18,4)") / 100))
        .withColumn(
            "ts",
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=idx),
        )
    )
    src.write.mode("overwrite").parquet(src_dir)
    shutil.rmtree(enc_dir, ignore_errors=True)
    encode_table(
        spark, spark.read.parquet(src_dir), enc_dir, key="doc_id", n_chunks=6
    )
    return src_dir, enc_dir


def _ensure_q48_artifacts(spark) -> tuple[str, str]:
    from .operators.encode import scan_done_chunks
    from .sources import fsio

    dirs = (f"{ARTIFACT_DIR}/q48_src", f"{ARTIFACT_DIR}/q48_enc")
    try:
        done = scan_done_chunks(dirs[1])
        ok = (
            len(done) == 6
            and fsio.exists(f"{dirs[0]}/_SUCCESS")
            # artifacts must carry the round-5 TAGGED stats (an older
            # cached dir without them would silently skip pruning)
            and '"dec"' in (next(iter(done.values())).get("col_stats") or "")
        )
    except OSError:
        ok = False
    return dirs if ok else _build_q48_artifacts(spark)


def q48_decimal_pruned_decode(spark, sf):
    """Decimal-column zone-map read path (q40's generalization to the
    TAGGED stat domains): decode only the chunks whose sidecar
    col_stats['price'] — exact decimal strings tagged "dec" — overlap
    the predicate, exact row filter after decode. The oracle
    recomputes the aggregate from the source parquet with a plain
    WHERE; agreement certifies pruning dropped no qualifying row."""
    import decimal

    from .operators.decode import decode_table

    _src, enc_dir = _ensure_q48_artifacts(spark)
    dec = decode_table(
        spark, enc_dir,
        where=("price", decimal.Decimal("5.00"), decimal.Decimal("12.00")),
    )
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
            F.sum((F.col("price") * 10000).cast("long")).alias("price_scaled_sum"),
        )
        .orderBy("source")
    )


SQL_Q48 = f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       CAST(SUM(CAST(price * 10000 AS BIGINT)) AS BIGINT) AS price_scaled_sum
FROM read_parquet('{ARTIFACT_DIR}/q48_src/*.parquet')
WHERE price BETWEEN 5.00 AND 12.00
GROUP BY source ORDER BY source
"""


def q49_timestamp_pruned_decode(spark, sf):
    """Timestamp-column zone-map read path: sidecar stats are
    fixed-width ISO strings tagged "ts" (lexicographic == chronological
    by construction), pruned against datetime bounds, exact row filter
    after decode. Oracle recomputes from source parquet (UTC both
    sides — session TZ pinned in session.py)."""
    import datetime as dt

    from .operators.decode import decode_table

    _src, enc_dir = _ensure_q48_artifacts(spark)
    dec = decode_table(
        spark, enc_dir,
        where=(
            "ts",
            dt.datetime(2024, 1, 1, 0, 10),
            dt.datetime(2024, 1, 1, 0, 25),
        ),
    )
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("ts").cast("string").alias("ts_min"),
            F.max("ts").cast("string").alias("ts_max"),
        )
        .orderBy("source")
    )


SQL_Q49 = f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(MIN(ts) AS VARCHAR) AS ts_min,
       CAST(MAX(ts) AS VARCHAR) AS ts_max
FROM read_parquet('{ARTIFACT_DIR}/q48_src/*.parquet')
WHERE ts BETWEEN TIMESTAMP '2024-01-01 00:10:00'
             AND TIMESTAMP '2024-01-01 00:25:00'
GROUP BY source ORDER BY source
"""


def _build_q50_artifacts(spark) -> tuple[str, str]:
    """(src, enc) dirs for the compaction/GC lifecycle oracle — the
    lakehouse rewrite-safety invariant (the reference's round-trip
    guarantee, /root/reference/tests/test_round_trip.py:40-74, carried
    through a REWRITE of the stored files, not just one encode pass).

    The deterministic tokens table is encoded deliberately UNDERSIZED
    (16 chunks of ~125 rows), then ``compact_chunks`` merges the small
    chunks into ~full-size ones via REPLACE-semantics sidecars and
    ``gc_superseded`` physically deletes the superseded files. The
    build asserts the lifecycle actually ran — live chunks strictly
    fewer than encoded, zero superseded chunks remaining — so q50's
    oracle agreement certifies the post-GC live view, not a no-op."""
    import shutil

    from .datagen import tokens_table
    from .operators.encode import (
        compact_chunks, encode_table, live_chunks, scan_done_chunks,
    )

    src_dir = f"{ARTIFACT_DIR}/q50_src"
    enc_dir = f"{ARTIFACT_DIR}/q50_enc"
    tokens_table(spark, 2000, seed=777, avg_len=32).write.mode(
        "overwrite"
    ).parquet(src_dir)
    shutil.rmtree(enc_dir, ignore_errors=True)
    encode_table(
        spark, spark.read.parquet(src_dir), enc_dir, key="doc_id", n_chunks=16
    )
    n_before = len(scan_done_chunks(enc_dir))
    compact_chunks(spark, enc_dir, min_rows=200, gc=True)
    done = scan_done_chunks(enc_dir)
    assert len(done) < n_before, "compaction merged nothing"
    assert len(done) == len(live_chunks(done)), "GC left superseded chunks"
    return src_dir, enc_dir


def _ensure_q50_artifacts(spark) -> tuple[str, str]:
    from .operators.encode import live_chunks, scan_done_chunks
    from .sources import fsio

    dirs = (f"{ARTIFACT_DIR}/q50_src", f"{ARTIFACT_DIR}/q50_enc")
    try:
        done = scan_done_chunks(dirs[1])
        ok = (
            fsio.exists(f"{dirs[0]}/_SUCCESS")
            # post-lifecycle shape: fewer than the 16 encoded chunks
            # remain AND none of them is superseded (GC completed) —
            # a crash mid-build leaves 16 (or superseded) chunks and
            # triggers a rebuild
            and 0 < len(done) < 16
            and len(done) == len(live_chunks(done))
        )
    except OSError:
        ok = False
    return dirs if ok else _build_q50_artifacts(spark)


def q50_compaction_gc_roundtrip(spark, sf):
    """Full storage lifecycle under oracle: encode small -> compact
    (REPLACE sidecars) -> GC (physical delete) -> decode the live
    view. The DuckDB oracle recomputes per-source count, token-count
    sum, token-VALUE sum (content checksum, not just shape) and key
    extrema from the untouched source parquet — agreement proves the
    rewrite lost no row, duplicated no row, and altered no token."""
    from .operators.decode import decode_table

    _src, enc_dir = _ensure_q50_artifacts(spark)
    dec = decode_table(spark, enc_dir)
    tok_sum = F.aggregate(
        "tokens", F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
            F.sum(tok_sum).cast("long").alias("tok_value_sum"),
            F.min("doc_id").alias("doc_min"),
            F.max("doc_id").alias("doc_max"),
        )
        .orderBy("source")
    )


SQL_Q50 = f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       CAST(SUM(CAST(list_sum(tokens) AS BIGINT)) AS BIGINT) AS tok_value_sum,
       MIN(doc_id) AS doc_min, MAX(doc_id) AS doc_max
FROM read_parquet('{ARTIFACT_DIR}/q50_src/*.parquet')
GROUP BY source ORDER BY source
"""


def q51_video_frame_sample(spark, sf):
    """REAL video decode, oracled: every payload is a genuine
    uncompressed-DIB RIFF/AVI (pure-numpy codec, no media libraries);
    the Spark side decodes ACTUAL frames and samples one per 100 ms
    (operators/multimodal.py sample_frames, fake=False), while DuckDB
    independently predicts the sampled-frame count, geometry, and raw
    RGB byte volume from the metadata columns alone — so a decoder
    that mis-parsed fps, frame count, dimensions, or row padding
    mismatches. Scale shape: mapInPandas over payload batches, frame
    stacks bounded by batch_rows (the 100-TB media path)."""
    from .operators.multimodal import sample_frames, synthetic_media_table

    media_dir = f"{ARTIFACT_DIR}/q51_media"
    synthetic_media_table(spark, n_rows=36, real_video=True).write.mode(
        "overwrite"
    ).parquet(media_dir)
    media = spark.read.parquet(media_dir)
    return (
        sample_frames(media, every_ms=100, fake=False)
        .groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("frame_w").alias("w"),
            F.max("frame_h").alias("h"),
            F.sum(F.octet_length("frame")).alias("rgb_bytes"),
        )
        .orderBy("media_id")
    )


SQL_Q51 = f"""
SELECT media_id,
       CAST(ceil(duration_ms / 100.0) AS BIGINT) AS n_sampled,
       width AS w, height AS h,
       CAST(ceil(duration_ms / 100.0) AS BIGINT)
           * width * height * 3 AS rgb_bytes
FROM read_parquet('{ARTIFACT_DIR}/q51_media/*.parquet')
WHERE modality = 'video'
ORDER BY media_id
"""


def q52_duplicated_passages(spark, sf):
    """Substring-level (positional) dedup report — the exact
    duplicated-passage accounting of Lee et al. 2022, relationally.

    Corpus: documents ∪ twins that copy each doc's first 10
    normalized tokens behind a twin-unique head token, so every
    original/twin pair shares a ~10-token passage (plus whatever
    cross-document repetition the corpus already has) while the rest
    of each twin is unique. Stats over 3-gram shingles, spans kept at
    >= 5 tokens.
    """
    d = _t(spark, sf, "documents").select("doc_id", "text")
    w10 = F.slice(F.split(dedup.normalize_text(F.col("text")), " "), 1, 10)
    twin = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("tw"), F.col("doc_id").cast("string")),
            F.concat_ws(" ", w10),
        ).alias("text"),
    )
    corpus = d.unionAll(twin)
    return (
        dedup.duplicated_passage_stats(
            corpus, "text", "doc_id", n=3, min_tokens=5
        )
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


SQL_Q52 = r"""
WITH base AS (SELECT doc_id, text FROM documents),
corpus AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         'tw' || CAST(doc_id AS VARCHAR) || ' ' ||
         array_to_string(
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')[1:10],
           ' ') AS text
  FROM base
),
docs AS (
  SELECT doc_id AS id,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM corpus
),
words AS (SELECT id, string_split(t, ' ') AS ws FROM docs),
grams AS (
  SELECT id, i - 1 AS pos, array_to_string(ws[i:i+2], ' ') AS shingle
  FROM words, UNNEST(generate_series(1, greatest(len(ws) - 2, 1))) AS u(i)
  WHERE length(array_to_string(ws[i:i+2], ' ')) > 0
),
dupsh AS (SELECT shingle FROM grams GROUP BY shingle HAVING MIN(id) <> MAX(id)),
hits AS (SELECT g.id, g.pos FROM grams g JOIN dupsh USING (shingle)),
brk AS (
  SELECT id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY id ORDER BY pos) > 3
              THEN 1 ELSE 0 END AS b
  FROM hits
),
isl AS (
  SELECT id, pos,
         SUM(b) OVER (PARTITION BY id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM brk
),
spans AS (
  SELECT id, island, MIN(pos) AS s, MAX(pos) + 2 AS e
  FROM isl GROUP BY id, island
),
good AS (SELECT id, e - s + 1 AS span_tokens FROM spans WHERE e - s + 1 >= 5),
stats AS (
  SELECT id, COUNT(*) AS n_spans, CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens
  FROM good GROUP BY id
),
toks AS (SELECT id, len(ws) AS n_tokens FROM words)
SELECT t.id AS doc_id,
       COALESCE(n_spans, 0) AS n_spans,
       COALESCE(dup_tokens, 0) AS dup_tokens,
       n_tokens
FROM toks t LEFT JOIN stats USING (id)
ORDER BY doc_id
"""


def q53_pq_adc_topk(spark, sf):
    """Product-quantization ANN: fit (m=8, k=16) codebooks (the only
    stochastic step; persisted as an artifact), quantize every vector
    to 8 codes, ADC top-10 for the query vector. The oracle re-derives
    EVERY code (per-subspace ||v_s - c||^2 argmin, ties to lowest cid)
    and the ADC sums from the persisted codebooks alone — nothing
    engine-side is trusted."""
    import pandas as pd
    import numpy as np

    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    books = similarity.pq_fit(emb, m=8, k=16)
    rows = [
        {"sub": s, "cid": c, "centroid": books[s, c].tolist()}
        for s in range(books.shape[0])
        for c in range(books.shape[1])
    ]
    cdf = spark.createDataFrame(pd.DataFrame(rows))
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{ARTIFACT_DIR}/q53_codebooks")
    persisted = (
        spark.read.parquet(f"{ARTIFACT_DIR}/q53_codebooks")
        .orderBy("sub", "cid")
        .collect()
    )
    books = np.array([r.centroid for r in persisted], dtype="float64").reshape(
        books.shape
    )
    codes = similarity.pq_encode(emb, books)
    return similarity.pq_shortlist_rerank(
        emb, codes, books, _query_vec(spark, sf), k=10, shortlist=50
    )


SQL_Q53 = f"""
WITH cb AS (
  SELECT sub, cid, CAST(centroid AS DOUBLE[]) AS c
  FROM read_parquet('{{ARTIFACT_DIR}}/q53_codebooks/*.parquet')
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id <> 0
),
subs AS (SELECT DISTINCT sub FROM cb),
vsub AS (
  SELECT vec_id, sub, v[sub*8+1 : sub*8+8] AS vs FROM vecs, subs
),
asg AS (
  SELECT vec_id, vsub.sub, cid,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id, vsub.sub
           ORDER BY list_dot_product(vs, vs) - 2*list_dot_product(vs, c)
                    + list_dot_product(c, c),
                    cid
         ) AS rn
  FROM vsub JOIN cb ON cb.sub = vsub.sub
),
codes AS (SELECT vec_id, sub, cid FROM asg WHERE rn = 1),
qsub AS (SELECT sub, qv[sub*8+1 : sub*8+8] AS qs FROM q, subs),
lut AS (
  SELECT cb.sub, cb.cid,
         list_dot_product(qs, qs) - 2*list_dot_product(qs, c)
           + list_dot_product(c, c) AS ld
  FROM qsub JOIN cb ON cb.sub = qsub.sub
),
adc AS (
  SELECT codes.vec_id, round(SUM(ld), 5) AS ad2
  FROM codes JOIN lut ON lut.sub = codes.sub AND lut.cid = codes.cid
  GROUP BY codes.vec_id
),
short AS (SELECT vec_id FROM adc ORDER BY ad2, vec_id LIMIT 50)
SELECT v.vec_id,
       round(list_dot_product(v.v, v.v) - 2*list_dot_product(v.v, qv)
             + list_dot_product(qv, qv), 5) AS d2
FROM vecs v JOIN short USING (vec_id), q
ORDER BY d2, v.vec_id LIMIT 10
""".replace("{ARTIFACT_DIR}", ARTIFACT_DIR)



def q54_ivfpq_adc_topk(spark, sf):
    """IVF-PQ ANN: coarse k-means (nlist=4) routes vectors to lists,
    PQ (m=8, k=16) quantizes the RESIDUALS, search probes the 2
    nearest lists with per-list ADC LUTs and exact-reranks a 50-deep
    shortlist. Both artifacts (coarse centroids + residual codebooks)
    persist as parquet; the oracle re-derives the list assignment,
    every residual code, the per-list LUTs, and the ADC sums from the
    artifacts alone — distributing every dot product (residuals never
    materialize in SQL: r.w = v.w - c.w)."""
    import pandas as pd
    import numpy as np

    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    cents = similarity.ivf_fit_centroids(emb, k=4, seed=7)
    books = similarity.ivfpq_fit(emb, cents, m=8, k=16)
    cdf = spark.createDataFrame(pd.DataFrame(
        {"list": range(len(cents)), "centroid": [c.tolist() for c in cents]}
    ))
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{ARTIFACT_DIR}/q54_coarse")
    bdf = spark.createDataFrame(pd.DataFrame(
        [{"sub": s, "cid": c, "codeword": books[s, c].tolist()}
         for s in range(books.shape[0]) for c in range(books.shape[1])]
    ))
    bdf.coalesce(1).write.mode("overwrite").parquet(f"{ARTIFACT_DIR}/q54_books")
    cents = np.array(
        [r.centroid for r in spark.read.parquet(f"{ARTIFACT_DIR}/q54_coarse")
         .orderBy("list").collect()], dtype="float64")
    persisted = (
        spark.read.parquet(f"{ARTIFACT_DIR}/q54_books").orderBy("sub", "cid").collect()
    )
    books = np.array([r.codeword for r in persisted], dtype="float64").reshape(
        books.shape
    )
    codes = similarity.ivfpq_encode(emb, cents, books)
    return similarity.ivfpq_shortlist_rerank(
        emb, codes, cents, books, _query_vec(spark, sf),
        k=10, nprobe=2, shortlist=50,
    )


SQL_Q54 = """
WITH coarse AS (
  SELECT list, CAST(centroid AS DOUBLE[]) AS c
  FROM read_parquet('{ARTIFACT_DIR}/q54_coarse/*.parquet')
),
cb AS (
  SELECT sub, cid, CAST(codeword AS DOUBLE[]) AS w
  FROM read_parquet('{ARTIFACT_DIR}/q54_books/*.parquet')
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id <> 0
),
-- coarse assignment: argmin_l ||v - c_l||^2, ties to lowest list
asg AS (
  SELECT vec_id, list, c,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY list_dot_product(c, c) - 2*list_dot_product(v, c), list
         ) AS rn
  FROM vecs, coarse
),
vlist AS (SELECT vec_id, list, c FROM asg WHERE rn = 1),
subs AS (SELECT DISTINCT sub FROM cb),
-- residual codes: argmin_w ||r_s - w||^2 with r_s.w = v_s.w - c_s.w
-- (v_s.v_s terms are per-(vec,sub) constants, dropped from the argmin)
vsub AS (
  SELECT v.vec_id, vl.list, s.sub,
         v.v[s.sub*8+1 : s.sub*8+8] AS vs,
         vl.c[s.sub*8+1 : s.sub*8+8] AS cs
  FROM vecs v JOIN vlist vl USING (vec_id), subs s
),
casg AS (
  SELECT vec_id, list, vsub.sub, cid,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id, vsub.sub
           ORDER BY list_dot_product(w, w)
                    - 2*(list_dot_product(vs, w) - list_dot_product(cs, w)),
                    cid
         ) AS rn
  FROM vsub JOIN cb ON cb.sub = vsub.sub
),
codes AS (SELECT vec_id, list, sub, cid FROM casg WHERE rn = 1),
-- probe the 2 lists nearest the query
probes AS (
  SELECT list, c FROM coarse, q
  ORDER BY list_dot_product(c, c) - 2*list_dot_product(qv, c), list
  LIMIT 2
),
-- per-list ADC LUT: ||qr_s - w||^2 with qr = q - c_list, distributed
lut AS (
  SELECT p.list, cb.sub, cb.cid,
         list_dot_product(qs, qs) - 2*list_dot_product(qs, csl)
           + list_dot_product(csl, csl)
           - 2*(list_dot_product(qs, w) - list_dot_product(csl, w))
           + list_dot_product(w, w) AS ld
  FROM (
    SELECT p.list, s.sub,
           qv[s.sub*8+1 : s.sub*8+8] AS qs,
           p.c[s.sub*8+1 : s.sub*8+8] AS csl
    FROM probes p, subs s, q
  ) p JOIN cb ON cb.sub = p.sub
),
adc AS (
  SELECT codes.vec_id, round(SUM(ld), 5) AS ad2
  FROM codes
  JOIN lut ON lut.list = codes.list AND lut.sub = codes.sub
          AND lut.cid = codes.cid
  GROUP BY codes.vec_id
),
short AS (SELECT vec_id FROM adc ORDER BY ad2, vec_id LIMIT 50)
SELECT v.vec_id,
       round(list_dot_product(v.v, v.v) - 2*list_dot_product(v.v, qv)
             + list_dot_product(qv, qv), 5) AS d2
FROM vecs v JOIN short USING (vec_id), q
ORDER BY d2, v.vec_id LIMIT 10
""".replace("{ARTIFACT_DIR}", ARTIFACT_DIR)



def q55_sq_int8_topk(spark, sf):
    """Scalar-quantization (int8) ANN — the zero-Python quantizer:
    fit is one posexplode aggregate, encode/search are pure JVM
    zip_with expressions. The per-dimension (min, scale) artifact
    persists as parquet; the oracle re-derives every code
    (floor((v-min)/scale + 0.5) clamped to [0,255], constant dims to
    0), dequantizes, and recomputes the approximate distances — the
    whole codec replayed row-by-row in SQL."""
    import pandas as pd

    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    mins, scales = similarity.sq_fit(emb)
    adf = spark.createDataFrame(pd.DataFrame(
        {"dim": range(len(mins)), "mn": mins, "scale": scales}
    ))
    adf.coalesce(1).write.mode("overwrite").parquet(f"{ARTIFACT_DIR}/q55_sq")
    art = spark.read.parquet(f"{ARTIFACT_DIR}/q55_sq").orderBy("dim").collect()
    mins = [r.mn for r in art]
    scales = [r.scale for r in art]
    codes = similarity.sq_encode(emb, mins, scales)
    return similarity.sq_topk(codes, mins, scales, _query_vec(spark, sf), k=10)


SQL_Q55 = """
WITH art AS (
  SELECT dim, mn, scale FROM read_parquet('{ARTIFACT_DIR}/q55_sq/*.parquet')
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id <> 0
),
vd AS (
  SELECT vec_id, u.i - 1 AS dim, v[u.i] AS val
  FROM vecs, UNNEST(generate_series(1, len(v))) AS u(i)
),
deq AS (
  SELECT vec_id, vd.dim,
         mn + (CASE WHEN scale = 0 THEN 0
                    ELSE greatest(0, least(255,
                         CAST(floor((val - mn) / scale + 0.5) AS INT)))
               END) * scale AS x
  FROM vd JOIN art ON art.dim = vd.dim
),
qd AS (
  SELECT u.i - 1 AS dim, qv[u.i] AS qval
  FROM q, UNNEST(generate_series(1, len(qv))) AS u(i)
)
SELECT vec_id, round(SUM((x - qval) * (x - qval)), 5) AS ad2
FROM deq JOIN qd ON qd.dim = deq.dim
GROUP BY vec_id
ORDER BY ad2, vec_id LIMIT 10
""".replace("{ARTIFACT_DIR}", ARTIFACT_DIR)



def q56_mixture_resample(spark, sf):
    """Deterministic mixture resampling (the data-recipe operator):
    src0 upsampled 3.5x (every row 3 epochs + ~half a 4th), src1
    downsampled to 0.4, src2 dropped, everything else passes through
    once. The oracle replays the identical arithmetic — portable md5
    bucket, floor + fractional-cut copies, generate_series expansion —
    so the multisets must agree row-for-row including the epoch ids."""
    from .operators import sampling

    d = _t(spark, sf, "documents").select("doc_id", "source")
    out = sampling.mixture_resample(
        d, {"src0": 3.5, "src1": 0.4, "src2": 0.0}
    )
    return out.orderBy("doc_id", "epoch")


SQL_Q56 = """
WITH d AS (
  SELECT doc_id, source,
         CASE source WHEN 'src0' THEN 3.5 WHEN 'src1' THEN 0.4
                     WHEN 'src2' THEN 0.0 ELSE 1.0 END AS rate,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT)
           % 1000000 AS u
  FROM documents
),
c AS (
  SELECT doc_id, source,
         CAST(floor(rate) AS INT)
         + CASE WHEN u < round((rate - floor(rate)) * 1000000)
                THEN 1 ELSE 0 END AS copies
  FROM d
)
SELECT doc_id, source, CAST(e.epoch AS INT) AS epoch
FROM c, UNNEST(generate_series(1, copies)) AS e(epoch)
ORDER BY doc_id, epoch
"""



def q57_append_generation_roundtrip(spark, sf):
    """Incremental ingest under oracle: encode generation 0, then
    encode_append generation 1 (a disjoint batch) into the SAME table,
    decode the live view, and aggregate per source. The DuckDB oracle
    recomputes count, token-count sum, token-VALUE sum and key extrema
    from the two untouched source parquets — agreement proves the
    append added every batch-1 row, duplicated no batch-0 row, and the
    resume filter stayed scoped to its own generation."""
    import shutil

    from .datagen import tokens_table
    from .operators.decode import decode_table
    from .operators.encode import encode_append, encode_table

    src0 = f"{ARTIFACT_DIR}/q57_src0"
    src1 = f"{ARTIFACT_DIR}/q57_src1"
    enc = f"{ARTIFACT_DIR}/q57_enc"
    shutil.rmtree(enc, ignore_errors=True)
    a = tokens_table(spark, 700, seed=21)
    b = tokens_table(spark, 500, seed=22).selectExpr(
        "concat('g1-', doc_id) as doc_id", "tokens", "n_tok", "source"
    )
    a.write.mode("overwrite").parquet(src0)
    b.write.mode("overwrite").parquet(src1)
    encode_table(spark, spark.read.parquet(src0), enc, n_chunks=6)
    encode_append(spark, spark.read.parquet(src1), enc, generation=1)
    dec = decode_table(spark, enc)
    tok_sum = F.aggregate(
        "tokens", F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
            F.sum(tok_sum).cast("long").alias("tok_value_sum"),
            F.min("doc_id").alias("doc_min"),
            F.max("doc_id").alias("doc_max"),
        )
        .orderBy("source")
    )


SQL_Q57 = f"""
WITH u AS (
  SELECT * FROM read_parquet('{ARTIFACT_DIR}/q57_src0/*.parquet')
  UNION ALL
  SELECT * FROM read_parquet('{ARTIFACT_DIR}/q57_src1/*.parquet')
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       CAST(SUM(CAST(list_sum(tokens) AS BIGINT)) AS BIGINT) AS tok_value_sum,
       MIN(doc_id) AS doc_min, MAX(doc_id) AS doc_max
FROM u
GROUP BY source ORDER BY source
"""



def q58_delete_rows_roundtrip(spark, sf):
    """Row-level DELETE under oracle: encode -> delete_rows
    (copy-on-write rewrite, n_tok BETWEEN 120 AND 240) -> GC -> decode
    the live view. The DuckDB oracle computes the same per-source
    aggregates over the untouched source parquet with NOT BETWEEN —
    agreement proves the rewrite removed exactly the matching rows and
    left every byte of every surviving row intact."""
    import shutil

    from .datagen import tokens_table
    from .operators.decode import decode_table
    from .operators.encode import delete_rows, encode_table

    src_dir = f"{ARTIFACT_DIR}/q58_src"
    enc = f"{ARTIFACT_DIR}/q58_enc"
    shutil.rmtree(enc, ignore_errors=True)
    tokens_table(spark, 800, seed=41).write.mode("overwrite").parquet(src_dir)
    encode_table(spark, spark.read.parquet(src_dir), enc, n_chunks=8)
    delete_rows(spark, enc, ("n_tok", 120, 240), gc=True)
    dec = decode_table(spark, enc)
    tok_sum = F.aggregate(
        "tokens", F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
            F.sum(tok_sum).cast("long").alias("tok_value_sum"),
            F.min("doc_id").alias("doc_min"),
            F.max("doc_id").alias("doc_max"),
        )
        .orderBy("source")
    )


SQL_Q58 = f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       CAST(SUM(CAST(list_sum(tokens) AS BIGINT)) AS BIGINT) AS tok_value_sum,
       MIN(doc_id) AS doc_min, MAX(doc_id) AS doc_max
FROM read_parquet('{ARTIFACT_DIR}/q58_src/*.parquet')
WHERE n_tok NOT BETWEEN 120 AND 240
GROUP BY source ORDER BY source
"""



def q59_upsert_roundtrip(spark, sf):
    """MERGE under oracle: encode a source, upsert a batch (60 existing
    keys with REWRITTEN token payloads + 40 new keys), GC, decode. The
    DuckDB oracle recomputes the post-merge truth from the two
    untouched parquet inputs alone — source anti-join batch keys,
    UNION ALL batch — so a merge that lost a row, kept a stale
    payload, duplicated a key, or dropped a bystander mismatches."""
    import shutil

    from .datagen import tokens_table
    from .operators.decode import decode_table
    from .operators.encode import encode_table, upsert_rows

    src_dir = f"{ARTIFACT_DIR}/q59_src"
    bat_dir = f"{ARTIFACT_DIR}/q59_batch"
    enc = f"{ARTIFACT_DIR}/q59_enc"
    shutil.rmtree(enc, ignore_errors=True)
    src = tokens_table(spark, 600, seed=61)
    upd = (
        src.orderBy("doc_id").limit(60)
        .withColumn(
            "tokens",
            F.transform("tokens", lambda x: F.pmod(x, F.lit(997)).cast("int")),
        )
        .withColumn("n_tok", F.size("tokens"))
    )
    ins = tokens_table(spark, 40, seed=62).selectExpr(
        "concat('NEW', doc_id) as doc_id", "tokens", "n_tok", "source"
    )
    batch = upd.unionAll(ins)
    src.write.mode("overwrite").parquet(src_dir)
    batch.write.mode("overwrite").parquet(bat_dir)
    encode_table(spark, spark.read.parquet(src_dir), enc, n_chunks=6)
    upsert_rows(spark, spark.read.parquet(bat_dir), enc, generation=1, gc=True)
    dec = decode_table(spark, enc)
    tok_sum = F.aggregate(
        "tokens", F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
            F.sum(tok_sum).cast("long").alias("tok_value_sum"),
            F.min("doc_id").alias("doc_min"),
            F.max("doc_id").alias("doc_max"),
        )
        .orderBy("source")
    )


SQL_Q59 = f"""
WITH merged AS (
  SELECT s.* FROM read_parquet('{ARTIFACT_DIR}/q59_src/*.parquet') s
  ANTI JOIN read_parquet('{ARTIFACT_DIR}/q59_batch/*.parquet') b USING (doc_id)
  UNION ALL
  SELECT * FROM read_parquet('{ARTIFACT_DIR}/q59_batch/*.parquet')
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       CAST(SUM(CAST(list_sum(tokens) AS BIGINT)) AS BIGINT) AS tok_value_sum,
       MIN(doc_id) AS doc_min, MAX(doc_id) AS doc_max
FROM merged
GROUP BY source ORDER BY source
"""



def q60_schema_evolution_roundtrip(spark, sf):
    """Additive schema evolution under oracle: encode a base table,
    append a batch that ADDS a nullable double column (evolution on),
    decode the live view. DuckDB recomputes the truth from the two
    untouched parquet inputs with the old generation's new column as
    NULL — counts, sums over the added column (NULLs ignored, SQL
    semantics), token value sums, and extrema must all agree."""
    import shutil

    from .datagen import tokens_table
    from .operators.decode import decode_table
    from .operators.encode import encode_append, encode_table

    src0 = f"{ARTIFACT_DIR}/q60_src0"
    src1 = f"{ARTIFACT_DIR}/q60_src1"
    enc = f"{ARTIFACT_DIR}/q60_enc"
    shutil.rmtree(enc, ignore_errors=True)
    a = tokens_table(spark, 500, seed=91)
    b = tokens_table(spark, 300, seed=92).selectExpr(
        "concat('g1-', doc_id) as doc_id", "tokens", "n_tok", "source",
        "CAST(n_tok AS DOUBLE) / 7 as quality",
    )
    a.write.mode("overwrite").parquet(src0)
    b.write.mode("overwrite").parquet(src1)
    encode_table(spark, spark.read.parquet(src0), enc, n_chunks=5)
    encode_append(
        spark, spark.read.parquet(src1), enc, generation=1,
        allow_schema_evolution=True,
    )
    dec = decode_table(spark, enc)
    tok_sum = F.aggregate(
        "tokens", F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        dec.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("quality").alias("n_quality"),
            F.round(F.sum("quality"), 5).alias("sum_quality"),
            F.sum(tok_sum).cast("long").alias("tok_value_sum"),
            F.min("doc_id").alias("doc_min"),
            F.max("doc_id").alias("doc_max"),
        )
        .orderBy("source")
    )


SQL_Q60 = f"""
WITH u AS (
  SELECT doc_id, tokens, n_tok, source, CAST(NULL AS DOUBLE) AS quality
  FROM read_parquet('{ARTIFACT_DIR}/q60_src0/*.parquet')
  UNION ALL
  SELECT doc_id, tokens, n_tok, source, quality
  FROM read_parquet('{ARTIFACT_DIR}/q60_src1/*.parquet')
)
SELECT source, COUNT(*) AS n_docs,
       COUNT(quality) AS n_quality,
       round(SUM(quality), 5) AS sum_quality,
       CAST(SUM(CAST(list_sum(tokens) AS BIGINT)) AS BIGINT) AS tok_value_sum,
       MIN(doc_id) AS doc_min, MAX(doc_id) AS doc_max
FROM u
GROUP BY source ORDER BY source
"""


_Q61_PROBES = (
    "doc_000000000003",
    "doc_000000000041",
    "doc_000000000599",
    "g1-doc_000000000007",
    "doc_999999999999",  # absent — must prune, not match
)


def q61_time_travel_suite(spark, sf):
    """Snapshot time travel + bloom point lookup + manifest-only stats
    under oracle, one lifecycle: encode gen-0 with snapshot tracking,
    append gen-1 (v2), row-level DELETE with gc=True (v3 — GC must
    HONOR snapshot retention or the time-travel read below breaks),
    then three reads the DuckDB oracle re-derives from the untouched
    source parquets alone:

    - ``timetravel``: decode ``as_of=2`` (post-append, pre-delete) —
      oracle is the plain UNION of both sources with NO delete filter;
      agreement proves the snapshot pins the exact pre-delete
      membership and that GC left every retained chunk alone.
    - ``pointlookup``: ``key_in`` probes on the live view (zone-map +
      per-chunk key Bloom pruning, exact row filter after) — oracle is
      ``WHERE doc_id IN (...)`` over the post-delete truth; a bloom
      false NEGATIVE would lose a row and mismatch.
    - ``stats``: ``table_stats`` COUNT/MIN/MAX answered from the
      manifest alone (zero chunk reads) — oracle recomputes them from
      the data.
    - ``cdc_insert`` / ``cdc_delete``: ``table_changes`` incremental
      reads (v1→v2 must be exactly the appended batch as inserts;
      v2→v3 exactly the deleted rows as deletes, with rows merely
      moved by the rewrite cancelling) — oracle recomputes both change
      sets from the sources.
    """
    import shutil

    from .datagen import tokens_table
    from .operators.decode import decode_table, table_stats
    from .operators.encode import delete_rows, encode_append, encode_table

    src0 = f"{ARTIFACT_DIR}/q61_src0"
    src1 = f"{ARTIFACT_DIR}/q61_src1"
    enc = f"{ARTIFACT_DIR}/q61_enc"
    shutil.rmtree(enc, ignore_errors=True)
    a = tokens_table(spark, 600, seed=71)
    b = tokens_table(spark, 400, seed=72).selectExpr(
        "concat('g1-', doc_id) as doc_id", "tokens", "n_tok", "source"
    )
    a.write.mode("overwrite").parquet(src0)
    b.write.mode("overwrite").parquet(src1)
    encode_table(
        spark, spark.read.parquet(src0), enc, n_chunks=6, track_snapshots=True
    )
    encode_append(spark, spark.read.parquet(src1), enc, generation=1)
    delete_rows(spark, enc, ("n_tok", 100, 260), gc=True)
    tok_sum = F.aggregate(
        "tokens", F.lit(0).cast("long"), lambda acc, x: acc + x
    )

    def agg(df, stage):
        return (
            df.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tok").cast("long").alias("sum_tok"),
                F.sum(tok_sum).cast("long").alias("tok_value_sum"),
                F.min("doc_id").alias("doc_min"),
                F.max("doc_id").alias("doc_max"),
            )
            .select(F.lit(stage).alias("stage"), "*")
        )

    tt = agg(decode_table(spark, enc, as_of=2), "timetravel")
    pl = agg(decode_table(spark, enc, key_in=list(_Q61_PROBES)), "pointlookup")
    from .operators.snapshots import table_changes

    ci = agg(
        table_changes(spark, enc, 1, 2)
        .filter("_change = 'insert'").drop("_change"),
        "cdc_insert",
    )
    cd = agg(
        table_changes(spark, enc, 2, 3)
        .filter("_change = 'delete'").drop("_change"),
        "cdc_delete",
    )
    st = table_stats(spark, enc, columns=["doc_id"])
    di = st["columns"]["doc_id"]
    stats_df = spark.createDataFrame(
        [("stats", "_table", st["n_rows"], None, None, di["min"], di["max"])],
        "stage string, source string, n_docs long, sum_tok long, "
        "tok_value_sum long, doc_min string, doc_max string",
    )
    return (
        tt.unionByName(pl).unionByName(ci).unionByName(cd)
        .unionByName(stats_df).orderBy("stage", "source")
    )


_Q61_IN = ", ".join(f"'{p}'" for p in _Q61_PROBES)

SQL_Q61_SUITE = f"""
WITH u AS (
  SELECT * FROM read_parquet('{ARTIFACT_DIR}/q61_src0/*.parquet')
  UNION ALL
  SELECT * FROM read_parquet('{ARTIFACT_DIR}/q61_src1/*.parquet')
),
live AS (SELECT * FROM u WHERE n_tok NOT BETWEEN 100 AND 260)
SELECT 'timetravel' AS stage, source, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       CAST(SUM(CAST(list_sum(tokens) AS BIGINT)) AS BIGINT) AS tok_value_sum,
       MIN(doc_id) AS doc_min, MAX(doc_id) AS doc_max
FROM u GROUP BY source
UNION ALL
SELECT 'pointlookup', source, COUNT(*),
       CAST(SUM(n_tok) AS BIGINT),
       CAST(SUM(CAST(list_sum(tokens) AS BIGINT)) AS BIGINT),
       MIN(doc_id), MAX(doc_id)
FROM live WHERE doc_id IN ({_Q61_IN}) GROUP BY source
UNION ALL
SELECT 'cdc_insert', source, COUNT(*),
       CAST(SUM(n_tok) AS BIGINT),
       CAST(SUM(CAST(list_sum(tokens) AS BIGINT)) AS BIGINT),
       MIN(doc_id), MAX(doc_id)
FROM read_parquet('{ARTIFACT_DIR}/q61_src1/*.parquet') GROUP BY source
UNION ALL
SELECT 'cdc_delete', source, COUNT(*),
       CAST(SUM(n_tok) AS BIGINT),
       CAST(SUM(CAST(list_sum(tokens) AS BIGINT)) AS BIGINT),
       MIN(doc_id), MAX(doc_id)
FROM u WHERE n_tok BETWEEN 100 AND 260 GROUP BY source
UNION ALL
SELECT 'stats', '_table', COUNT(*), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), MIN(doc_id), MAX(doc_id)
FROM live
"""


# ---------------------------------------------------------------------------
# Suite folds (round 7). The driver's correctness gate records at most
# 50 queries per round (CORRECTNESS_r06 carried exactly the first 50
# rows of a 60-entry registry), so related checks fold into single
# registry slots — every underlying check still runs and still has its
# oracle; the component functions stay importable/testable on their own.
# ---------------------------------------------------------------------------


def q13_text_suite(spark, sf):
    """Text-analysis suite: per-doc stats (q13) + quality gate (q14) +
    language id (q15) in one wide row per document — one registry
    slot, three oracled operators.

    Single-pass since round 8 (guide §2.4): every output column is a
    per-row expression over the same ``documents`` scan, so the suite
    is ONE projection — the previous fold ran the three component
    queries as three scans and sort-merge-joined them on doc_id
    (3 scans + 2 joins for what one select computes; q14 recomputed
    five of q13's stat expressions verbatim). Whole-stage codegen's
    subexpression elimination shares the normalize/split work across
    the stopword columns. Rows are bit-identical to the join form —
    same component expressions, same column order (oracle SQL
    unchanged, CORRECTNESS hash unchanged)."""
    from .operators.dedup import normalize_text

    c = F.col("text")
    langs = sorted(textstats.STOPWORDS)
    # materialize the normalized text and its word split ONCE per row:
    # higher-order filter() runs interpreted (no codegen CSE), so the
    # five stopword counts must share one split array, not re-run the
    # normalize regex each (CollapseProject keeps multiply-referenced
    # non-trivial aliases un-inlined)
    base = _spread(spark, sf, "documents").select(
        "doc_id", "text", normalize_text(c).alias("_norm")
    ).select("doc_id", "text", "_norm", F.split("_norm", " ").alias("_w"))
    w = F.col("_w")

    def sw_count(lang):
        return F.size(F.filter(w, lambda x: x.isin(textstats.STOPWORDS[lang])))

    stats = base.select(
        "doc_id",
        F.length(c).alias("n_chars"),
        textstats.ws_token_count(c).alias("n_ws_tokens"),
        textstats.bpe_token_count(c).alias("n_bpe_tokens"),
        textstats.punct_count(c).alias("n_punct"),
        textstats.digit_count(c).alias("n_digits"),
        sw_count("en").alias("n_stop_en"),
        F.md5(F.col("_norm")).alias("fingerprint"),
        *[sw_count(lang).alias(f"s_{lang}") for lang in langs],
    )
    # q14's quality CASE, over the stat columns already computed
    bad = (
        (F.col("n_ws_tokens") < 10)
        | (F.col("n_punct") * 5 > F.col("n_chars"))
        | (F.col("n_digits") * 10 > F.col("n_chars") * 3)
        | ((F.col("n_stop_en") == 0) & (F.col("n_ws_tokens") >= 20))
    )
    # q15's vote fold: ascending lang order, strict > keeps earlier code
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        cond = F.col(f"s_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"s_{lang}")).otherwise(best_score)
    return stats.select(
        "doc_id", "n_chars", "n_ws_tokens", "n_bpe_tokens", "n_punct",
        "n_digits", "n_stop_en", "fingerprint",
        F.when(bad, F.lit("low")).otherwise(F.lit("ok")).alias("quality"),
        best.alias("lang_guess"),
        *[f"s_{lang}" for lang in langs],
    ).orderBy("doc_id")


SQL_Q13_SUITE = f"""
SELECT t.*, q.quality, l.* EXCLUDE (doc_id)
FROM ({SQL_Q13}) t
JOIN ({SQL_Q14}) q USING (doc_id)
JOIN ({SQL_Q15}) l USING (doc_id)
ORDER BY doc_id
"""


def q31_pruned_decode_suite(spark, sf):
    """Zone-map pruned decode suite: key-range (q31), non-key int
    column (q40), tagged decimal (q48) and tagged timestamp (q49)
    pruning, each decoding only overlapping chunks then exact-filtering
    — conformed to one (facet, source, n_docs, m1, m2) shape."""

    def conform(df, facet, m1, m2):
        return df.select(
            F.lit(facet).alias("facet"),
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col(m1).cast("string").alias("m1"),
            (F.col(m2) if m2 else F.lit(None)).cast("string").alias("m2"),
        )

    a = conform(q31_range_pruned_decode(spark, sf), "key_range", "sum_tok", None)
    b = conform(q40_column_pruned_decode(spark, sf), "column", "sum_tok", None)
    c = conform(
        q48_decimal_pruned_decode(spark, sf), "decimal", "sum_tok",
        "price_scaled_sum",
    )
    d = conform(q49_timestamp_pruned_decode(spark, sf), "timestamp", "ts_min", "ts_max")
    e = conform(q62_datasource_sql(spark, sf), "sql_pushdown", "sum_tok", None)
    g = conform(q63_zorder_pruned_decode(spark, sf), "zorder", "sum_tok", None)
    return (
        a.unionByName(b).unionByName(c).unionByName(d).unionByName(e)
        .unionByName(g).orderBy("facet", "source")
    )


SQL_Q31_SUITE = f"""
SELECT 'key_range' AS facet, source, n_docs,
       CAST(sum_tok AS VARCHAR) AS m1, CAST(NULL AS VARCHAR) AS m2
FROM ({SQL_Q31})
UNION ALL
SELECT 'column', source, n_docs, CAST(sum_tok AS VARCHAR), CAST(NULL AS VARCHAR)
FROM ({SQL_Q40})
UNION ALL
SELECT 'decimal', source, n_docs, CAST(sum_tok AS VARCHAR),
       CAST(price_scaled_sum AS VARCHAR)
FROM ({SQL_Q48})
UNION ALL
SELECT 'timestamp', source, n_docs, ts_min, ts_max
FROM ({SQL_Q49})
UNION ALL
SELECT 'sql_pushdown', source, n_docs, CAST(sum_tok AS VARCHAR),
       CAST(NULL AS VARCHAR)
FROM ({SQL_Q62})
UNION ALL
SELECT 'zorder', source, n_docs, CAST(sum_tok AS VARCHAR),
       CAST(NULL AS VARCHAR)
FROM ({SQL_Q63})
ORDER BY facet, source
"""


def q53_quantizer_suite(spark, sf):
    """Vector-quantizer suite: PQ ADC top-k (q53), IVF-PQ residual ADC
    top-k (q54) and int8 scalar-quantization top-k (q55) — each oracle
    re-derives every code from the persisted artifacts; results
    conformed to (facet, vec_id, score)."""
    p = q53_pq_adc_topk(spark, sf).select(
        F.lit("pq").alias("facet"), "vec_id", F.col("d2").alias("score")
    )
    i = q54_ivfpq_adc_topk(spark, sf).select(
        F.lit("ivfpq").alias("facet"), "vec_id", F.col("d2").alias("score")
    )
    s = q55_sq_int8_topk(spark, sf).select(
        F.lit("sq").alias("facet"), "vec_id", F.col("ad2").alias("score")
    )
    return p.unionByName(i).unionByName(s).orderBy("facet", "score", "vec_id")


SQL_Q53_SUITE = f"""
SELECT 'pq' AS facet, vec_id, d2 AS score FROM ({SQL_Q53})
UNION ALL
SELECT 'ivfpq', vec_id, d2 FROM ({SQL_Q54})
UNION ALL
SELECT 'sq', vec_id, ad2 FROM ({SQL_Q55})
ORDER BY facet, score, vec_id
"""


def q57_lakehouse_lifecycle(spark, sf):
    """Lakehouse-verb lifecycle suite: generation append (q57),
    row-level delete + GC (q58), MERGE/upsert (q59) and additive schema
    evolution (q60), each encode->verb->decode lifecycle re-derived by
    the DuckDB oracle from the untouched source parquets alone."""

    def conform(df, stage):
        cols = set(df.columns)
        return df.select(
            F.lit(stage).alias("stage"),
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            (F.col("sum_tok") if "sum_tok" in cols else F.lit(None))
            .cast("long").alias("sum_tok"),
            F.col("tok_value_sum").cast("long").alias("tok_value_sum"),
            (F.col("n_quality") if "n_quality" in cols else F.lit(None))
            .cast("long").alias("n_quality"),
            (F.col("sum_quality") if "sum_quality" in cols else F.lit(None))
            .cast("double").alias("sum_quality"),
            "doc_min",
            "doc_max",
        )

    a = conform(q57_append_generation_roundtrip(spark, sf), "append")
    b = conform(q58_delete_rows_roundtrip(spark, sf), "delete")
    c = conform(q59_upsert_roundtrip(spark, sf), "upsert")
    d = conform(q60_schema_evolution_roundtrip(spark, sf), "evolve")
    e = q61_time_travel_suite(spark, sf).select(
        "stage",
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("sum_tok").cast("long").alias("sum_tok"),
        F.col("tok_value_sum").cast("long").alias("tok_value_sum"),
        F.lit(None).cast("long").alias("n_quality"),
        F.lit(None).cast("double").alias("sum_quality"),
        "doc_min",
        "doc_max",
    )
    return (
        a.unionByName(b).unionByName(c).unionByName(d).unionByName(e)
        .orderBy("stage", "source")
    )


SQL_Q57_SUITE = f"""
SELECT 'append' AS stage, source, n_docs, sum_tok, tok_value_sum,
       CAST(NULL AS BIGINT) AS n_quality, CAST(NULL AS DOUBLE) AS sum_quality,
       doc_min, doc_max
FROM ({SQL_Q57})
UNION ALL
SELECT 'delete', source, n_docs, sum_tok, tok_value_sum,
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), doc_min, doc_max
FROM ({SQL_Q58})
UNION ALL
SELECT 'upsert', source, n_docs, sum_tok, tok_value_sum,
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), doc_min, doc_max
FROM ({SQL_Q59})
UNION ALL
SELECT 'evolve', source, n_docs, CAST(NULL AS BIGINT), tok_value_sum,
       n_quality, sum_quality, doc_min, doc_max
FROM ({SQL_Q60})
UNION ALL
SELECT stage, source, n_docs, sum_tok, tok_value_sum,
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), doc_min, doc_max
FROM ({SQL_Q61_SUITE})
ORDER BY stage, source
"""


QUERIES = {
    "q01_pricing_summary": (q01_pricing_summary, SQL_Q01),
    "q02_top_customers": (q02_top_customers, SQL_Q02),
    "q03_nation_revenue": (q03_nation_revenue, SQL_Q03),
    "q04_sessionize": (q04_sessionize, SQL_Q04),
    "q05_rle_runs": (q05_rle_runs, SQL_Q05),
    "q06_dict_stats": (q06_dict_stats, SQL_Q06),
    "q07_codec_choice": (q07_codec_choice, SQL_Q07),
    "q08_conform_cast": (q08_conform_cast, SQL_Q08),
    "q09_timestamp_conform": (q09_timestamp_conform, SQL_Q09),
    "q10_dedup_exact": (q10_dedup_exact, SQL_Q10),
    "q11_ngram_jaccard": (q11_ngram_jaccard, SQL_Q11),
    "q12_minhash_lsh": (q12_minhash_lsh, SQL_Q12),
    "q13_text_suite": (q13_text_suite, SQL_Q13_SUITE),
    "q16_similarity_topk": (q16_similarity_topk, SQL_Q16),
    "q17_embedding_neardup": (q17_embedding_neardup, SQL_Q17),
    "q18_stream_window": (q18_stream_window, SQL_Q18),
    "q19_salted_agg": (q19_salted_agg, SQL_Q19),
    "q24_set_ops": (q24_set_ops, SQL_Q24),
    "q25_rollup": (q25_rollup, SQL_Q25),
    "q26_asof_join": (q26_asof_join, SQL_Q26),
    "q27_window_suite": (q27_window_suite, SQL_Q27),
    "q28_dup_components": (q28_dup_components, SQL_Q28),
    "q29_training_pipeline": (q29_training_pipeline, SQL_Q29),
    "q30_pivot": (q30_pivot, SQL_Q30),
    "q20_tokens_roundtrip": (q20_tokens_roundtrip, SQL_Q20),
    "q21_simhash": (q21_simhash, SQL_Q21),
    "q22_ann_lsh": (q22_ann_lsh, SQL_Q22),
    "q23_multimodal_features": (q23_multimodal_features, SQL_Q23),
    "q31_pruned_decode_suite": (q31_pruned_decode_suite, SQL_Q31_SUITE),
    "q32_lsh_neardup_pairs": (q32_lsh_neardup_pairs, SQL_Q32),
    "q33_ivf_ann": (q33_ivf_ann, SQL_Q33),
    "q34_manifest_lineage": (q34_manifest_lineage, SQL_Q34),
    "q35_winnow_fingerprints": (q35_winnow_fingerprints, SQL_Q35),
    "q36_pack_sequences": (q36_pack_sequences, SQL_Q36),
    "q37_token_vocab": (q37_token_vocab, SQL_Q37),
    "q38_contamination": (q38_contamination, SQL_Q38),
    "q39_hash_split": (q39_hash_split, SQL_Q39),
    "q41_struct_roundtrip": (q41_struct_roundtrip, SQL_Q41),
    "q42_repetition_signals": (q42_repetition_signals, SQL_Q42),
    "q43_oov_rate": (q43_oov_rate, SQL_Q43),
    "q44_stratified_sample": (q44_stratified_sample, SQL_Q44),
    "q45_decimal_roundtrip": (q45_decimal_roundtrip, SQL_Q45),
    "q46_dedup_canonicalize": (q46_dedup_canonicalize, SQL_Q46),
    "q47_pii_redaction": (q47_pii_redaction, SQL_Q47),
    "q50_compaction_gc_roundtrip": (q50_compaction_gc_roundtrip, SQL_Q50),
    "q51_video_frame_sample": (q51_video_frame_sample, SQL_Q51),
    "q52_duplicated_passages": (q52_duplicated_passages, SQL_Q52),
    "q53_quantizer_suite": (q53_quantizer_suite, SQL_Q53_SUITE),
    "q56_mixture_resample": (q56_mixture_resample, SQL_Q56),
    "q57_lakehouse_lifecycle": (q57_lakehouse_lifecycle, SQL_Q57_SUITE),
}
