"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All JVM-side Column expressions (regexp +
aggregates) — no Python in the hot path, so they run at scan speed and
every one has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

# Tiny public stopword lists for n-gram language scoring (top function
# words; public knowledge, not from any corpus file).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "es"],
}

# BPE-ish tokenizer regex: word pieces, numbers, or single non-space
# symbols — a public approximation of GPT-2's split pattern.
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_token_count(c: Column) -> Column:
    """Whitespace token count; empty/blank -> 0."""
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_token_count(c: Column) -> Column:
    """Count of BPE-ish pieces via regexp_extract_all."""
    return F.size(F.regexp_extract_all(c, F.lit(BPE_REGEX), F.lit(0)))


def punct_count(c: Column) -> Column:
    return F.length(c) - F.length(F.regexp_replace(c, r"[!-/:-@\[-`{-~]", ""))


def digit_count(c: Column) -> Column:
    return F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))


def stopword_count(c: Column, lang: str = "en") -> Column:
    words = F.split(normalize_text(c), " ")
    sw = STOPWORDS[lang]
    return F.size(F.filter(words, lambda w: w.isin(sw)))


def fingerprint(c: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(c))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
    the MOSS algorithm): hash every char k-gram, slide a w-hash
    window, keep each window's minimum, emit the distinct minima.
    Guarantees a shared fingerprint for any match of length >= w+k-1;
    the standard near-dup/plagiarism sketch for large corpora.

    All JVM array expressions (sequence/transform/slice/array_min —
    one narrow map, no UDF, no explode shuffle until the final
    distinct). The k-gram hash is the md5-prefix integer (28-bit) so
    DuckDB reproduces every fingerprint exactly.
    """
    # materialize the normalized text (and then the gram array) ONCE
    # per row — referencing the normalization expression inside the
    # per-gram lambda would re-run the regex per element, O(len^2)
    base = df.select(
        F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("_t")
    )
    t = F.col("_t")
    n_grams = F.greatest(F.length(t) - (k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(
            F.substring(F.md5(t.substr(i, F.lit(k))), 1, 7), 16, 10
        ).cast("long"),
    )
    staged = base.select("id", grams.alias("_hs"))
    hs = F.col("_hs")
    n_wins = F.greatest(F.size(hs) - (w - 1), F.lit(1))
    wins = F.transform(
        F.sequence(F.lit(1), n_wins),
        lambda j: F.array_min(F.slice(hs, j, w)),
    )
    return (
        staged.select("id", F.explode(F.array_distinct(wins)).alias("fp"))
        .distinct()
    )


def text_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document integer stat vector (float-free; oracle-stable)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        ws_token_count(c).alias("n_ws_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        punct_count(c).alias("n_punct"),
        digit_count(c).alias("n_digits"),
        stopword_count(c, "en").alias("n_stop_en"),
        fingerprint(c).alias("fingerprint"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality label from integer ratios (filter-style gate).

    bad if: <10 ws tokens, or punct > 20% of chars, or digits > 30%
    of chars, or zero English stopwords in a >=20-token doc.
    """
    s = text_stats(df, text_col, id_col)
    bad = (
        (F.col("n_ws_tokens") < 10)
        | (F.col("n_punct") * 5 > F.col("n_chars"))
        | (F.col("n_digits") * 10 > F.col("n_chars") * 3)
        | ((F.col("n_stop_en") == 0) & (F.col("n_ws_tokens") >= 20))
    )
    return s.select(
        id_col,
        "n_chars",
        "n_ws_tokens",
        F.when(bad, F.lit("low")).otherwise(F.lit("ok")).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language guess across en/fr/de/es ('und' if no votes).

    Ties break deterministically by language code order.
    """
    c = F.col(text_col)
    scores = [stopword_count(c, lang).alias(f"s_{lang}") for lang in STOPWORDS]
    scored = df.select(F.col(id_col), *scores)
    langs = sorted(STOPWORDS)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:  # ascending; strict > keeps earlier code on ties
        cond = F.col(f"s_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"s_{lang}")).otherwise(best_score)
    return scored.select(id_col, best.alias("lang_guess"), *[f"s_{lang}" for lang in langs])


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 3,
) -> DataFrame:
    """Gopher/MassiveText-style within-document repetition signals.

    Per document: word count, the most frequent word (count-desc,
    word-asc tie-break) with the characters it accounts for, total
    word characters, and total vs distinct n-gram occurrence counts.
    Everything returned is an integer (oracle-hash stable); the
    fractions the published repetition filters threshold on are
    ``top_word_chars / total_word_chars`` and
    ``(n_grams - n_distinct_grams) / n_grams``.

    Dataflow: one explode into (doc, word) pairs, partially-aggregated
    groupBys keyed on (doc, word) / (doc, gram), and a per-doc
    row_number window for the top word — every exchange is keyed by
    the document id, so there are no self-joins and no corpus-wide
    windows; the plan is flat in corpus size. (The reference has no
    text analysis at all; this extends the same q13-q15 suite.)
    """
    from pyspark.sql import Window

    from .dedup import word_shingles

    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"),
    ).filter(F.length("w") > 0)
    wf = words.groupBy("id", "w").agg(F.count(F.lit(1)).alias("n"))
    win = Window.partitionBy("id").orderBy(F.desc("n"), F.asc("w"))
    top = (
        wf.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select(
            "id",
            F.col("w").alias("top_word"),
            (F.col("n") * F.length("w")).cast("long").alias("top_word_chars"),
        )
    )
    totals = wf.groupBy("id").agg(
        F.sum("n").cast("long").alias("n_words"),
        F.sum(F.col("n") * F.length("w")).cast("long").alias("total_word_chars"),
    )
    grams = word_shingles(df, text_col, id_col, ngram_n, distinct=False)
    gstats = grams.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.count_distinct("shingle").cast("long").alias("n_distinct_grams"),
    )
    return (
        totals.join(top, "id")
        .join(gstats, "id")
        .select(
            "id",
            "n_words",
            "top_word",
            "top_word_chars",
            "total_word_chars",
            "n_grams",
            "n_distinct_grams",
        )
    )


#: PII patterns kept to syntax both Java regex (Spark) and RE2 (DuckDB,
#: RE2-based) interpret identically, so redaction is oracle-checkable.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns=PII_PATTERNS,
) -> DataFrame:
    """Scrub emails / IPv4 addresses / phone-shaped numbers (the
    C4/CCNet-style pre-training hygiene pass): per document, the match
    count of each pattern against the ORIGINAL text plus the text with
    every pattern replaced by its placeholder, applied in declaration
    order. Pure JVM regexp expressions — scan speed, no Python, no
    shuffle."""
    c = F.col(text_col)
    cols = [F.col(id_col)]
    for name, pat, _ in patterns:
        cols.append(
            F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        )
    red = c
    for name, pat, repl in patterns:
        red = F.regexp_replace(red, pat, repl)
    return df.select(*cols, red.alias("redacted"))
