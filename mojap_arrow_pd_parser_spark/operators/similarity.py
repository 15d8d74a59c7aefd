"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k against a query vector:
  one narrow scan, JVM-side ``aggregate``/``zip_with`` dot products
  (no UDF), then a global top-k (takeOrdered semantics via orderBy +
  limit, which Spark executes as a per-partition partial top-k).
* ``pairwise_neardups`` — all pairs above a cosine threshold; at scale
  use the LSH variant, the exact one is for small/verification use.
* ``rp_lsh_buckets`` — random-hyperplane LSH: deterministic
  pseudo-hyperplanes derived from (seed, plane, dim) hashes, computed
  vectorized in a pandas UDF over the embedding column; bucket =
  sign-bit string. ANN = candidates from the query's bucket (and
  optionally neighboring buckets), re-ranked exactly.

Scale note: brute-force is O(N) per query and shuffles nothing; the
LSH path turns neardup mining into an equi-join on bucket id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 5,
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec`` (rounded for
    cross-engine float stability)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    return (
        df.select(F.col(id_col), F.round(cos, round_digits).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def l2_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 5,
) -> DataFrame:
    """Exact top-k by squared Euclidean distance — the metric twin of
    :func:`cosine_topk` and the ground truth for the PQ/ADC paths
    (which quantize L2, not cosine). Same scale shape: one narrow
    scan, JVM ``zip_with`` arithmetic, per-partition partial top-k."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col), q, lambda x, y: (x.cast("double") - y) ** 2
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        df.select(F.col(id_col), F.round(d2, round_digits).alias("d2"))
        .orderBy(F.col("d2").asc(), F.col(id_col))
        .limit(k)
    )


def pairwise_neardups(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 5,
) -> DataFrame:
    """Exact pairs with cosine >= threshold (id_a < id_b). O(N^2) — use
    rp_lsh_buckets + within-bucket compare for large N."""
    n = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    a, b = n.alias("a"), n.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cos, round_digits).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding near-dup mining at scale: bucket by random-hyperplane
    signature, compare ONLY within buckets (the O(N^2) cross-join of
    :func:`pairwise_neardups` becomes an equi-join on bucket id whose
    cost is sum of bucket sizes squared — tunable via n_planes), then
    exact cosine filter. Misses pairs split across buckets; recall is
    raised by lowering n_planes (or unioning a second seed's pass).

    ``max_bucket_size`` (opt-in) guards against degenerate hot buckets
    — a near-duplicate-heavy corpus at low n_planes can put size^2
    candidate rows in one bucket (the same failure class as the
    hot-shingle cap in dedup.ngram_jaccard_pairs). Buckets over the
    cap are RE-SPLIT into ceil(size/cap) sub-buckets by a secondary
    id hash, bounding candidates at ~cap per row while still finding
    the within-sub-bucket pairs; pairs split across sub-buckets are
    missed (approximation, documented — exact when ``None``)."""
    b = rp_lsh_buckets(df, dim, n_planes, seed, vec_col, id_col)
    join_on_sub = False
    if max_bucket_size is not None:
        hot = (
            b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket_size)
        )
        # hot-bucket list is tiny by construction -> broadcast join
        b = b.join(F.broadcast(hot), "bucket", "left")
        n_sub = F.ceil(F.col("_n") / F.lit(max_bucket_size))
        b = b.withColumn(
            "_sub",
            F.when(F.col("_n").isNull(), F.lit(0)).otherwise(
                F.pmod(F.xxhash64(F.col(id_col)), n_sub)
            ).cast("int"),
        ).drop("_n")
        join_on_sub = True
    x, y = b.alias("x"), b.alias("y")
    cos = _dot(F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}")) / (
        _norm(F.col(f"x.{vec_col}")) * _norm(F.col(f"y.{vec_col}"))
    )
    cond = (F.col("x.bucket") == F.col("y.bucket")) & (
        F.col(f"x.{id_col}") < F.col(f"y.{id_col}")
    )
    if join_on_sub:
        cond = cond & (F.col("x._sub") == F.col("y._sub"))
    return (
        x.join(y, cond)
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.round(cos, round_digits).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer -> probe nprobe
# nearest lists -> exact re-rank. The scale shape FAISS popularized:
# search cost drops from O(N) to O(N * nprobe / k) per query.
# ---------------------------------------------------------------------------


def ivf_fit_centroids(
    df: DataFrame, k: int = 16, seed: int = 42, vec_col: str = "embedding"
) -> np.ndarray:
    """Train the coarse quantizer (MLlib k-means, fixed seed) and
    return the (k, dim) float64 centroid matrix. Training is the only
    stochastic step; everything downstream derives deterministically
    from these centroids (which callers should persist)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vdf = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=20).fit(vdf)
    return np.array(model.clusterCenters(), dtype=np.float64)


#: beyond this many centroids the expression path's O(k) literal
#: arrays + when-chain bloat the plan (megabytes at real IVF k>=4096);
#: assignment switches to a broadcast-centroid vectorized pandas UDF
IVF_EXPR_MAX_K = 32


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_expr_k: int = IVF_EXPR_MAX_K,
) -> DataFrame:
    """Nearest-centroid list id per vector: argmin ||v-c||^2 with ties
    to the LOWEST cid.

    Two physical strategies, equivalent up to floating-point rounding
    (each path is internally deterministic, and each breaks exact ties
    to the lowest cid; but the two paths may disagree on NEAR-ties,
    because BLAS reassociates the matmul's accumulation while the
    expression path folds sequentially — distances can differ in the
    last ulps, flipping argmin when two centroids are that close):

    * k <= ``max_expr_k``: pure JVM expression — v.v - 2 v.c + c.c per
      centroid via sequential-fold dots (the exact formula the SQL
      oracle replicates, no BLAS reassociation);
    * k > ``max_expr_k``: vectorized pandas UDF whose (k, dim) float64
      centroid matrix ships in the task closure (one broadcast per
      executor — plan size stays FLAT in k, and the per-batch cost is
      one matmul instead of a k-deep when-chain). np.argmin's
      first-minimum rule gives the lowest-cid tie-break within this path.
    """
    if len(centroids) > max_expr_k:
        return _ivf_assign_broadcast(df, centroids, vec_col, id_col)
    vv = _dot(F.col(vec_col), F.col(vec_col))
    dists = []
    for c in centroids:
        carr = F.array(*[F.lit(float(x)) for x in c])
        cc = float(np.dot(c, c))
        dists.append(vv - 2.0 * _dot(F.col(vec_col), carr) + F.lit(cc))
    m = F.least(*dists)
    assign = F.when(dists[0] == m, 0)
    for cid in range(1, len(dists)):
        assign = assign.when(dists[cid] == m, cid)
    return df.select(F.col(id_col), F.col(vec_col), assign.alias("list_id"))


def _ivf_assign_broadcast(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Large-k assignment: centroids ride the task-binary broadcast
    into an Arrow-batched pandas UDF (the ``rp_lsh_buckets`` shape).
    Per row: argmin_c(-2 v.c + c.c) — dropping the row-constant v.v
    term does not change the argmin."""
    cent = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64))
    cc = (cent * cent).sum(axis=1)  # (k,)

    @F.pandas_udf("int")
    def nearest(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        d = cc - 2.0 * (mat @ cent.T)  # (batch, k)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return df.select(
        F.col(id_col), F.col(vec_col), nearest(F.col(vec_col)).alias("list_id")
    )


def ivf_search(
    df: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the ``nprobe`` lists nearest the query, exact re-rank.

    The probe choice is O(k) driver-side arithmetic; the candidate
    filter is a predicate on the assignment expression, so the whole
    search is one pruned scan + partial top-k — no shuffle."""
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q) ** 2).sum(axis=1)
    probes = [int(i) for i in np.lexsort((np.arange(len(d2)), d2))[:nprobe]]
    cand = ivf_assign(df, centroids, vec_col, id_col).filter(
        F.col("list_id").isin(probes)
    ).drop("list_id")
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def _hyperplanes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=[seed, 0xA11CE]))
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def rp_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector (vectorized pandas UDF).

    The hyperplane matrix is derived deterministically from the seed,
    so executors regenerate it identically — nothing to broadcast.
    """
    # float64 dot products: the bucket bit is a sign test, and the
    # DuckDB oracle computes the same dot in double — keeping both
    # sides in f64 makes the sign decision identical except for
    # exactly-zero dots (measure-zero on real data).
    planes = _hyperplanes(n_planes, dim, seed).astype(np.float64)

    @F.pandas_udf("long")
    def bucket(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        signs = (mat @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((signs @ weights).astype(np.int64))

    return df.select(F.col(id_col), F.col(vec_col), bucket(F.col(vec_col)).alias("bucket"))


def probe_buckets(query_bucket: int, n_planes: int, radius: int = 1) -> list[int]:
    """Multiprobe bucket set: the query's bucket plus every bucket
    within Hamming distance ``radius`` in sign-bit space (bit flips =
    vectors near a hyperplane falling on the other side)."""
    from itertools import combinations

    out = [query_bucket]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_planes), r):
            mask = 0
            for j in bits:
                mask |= 1 << j
            out.append(query_bucket ^ mask)
    return out


def directed_probes(
    query_vec: np.ndarray,
    planes: np.ndarray,
    query_bucket: int,
    n_probes: int,
    max_flip_bits: int = 4,
) -> list[int]:
    """Query-directed multiprobe (Lv et al., VLDB 2007 idea): probe the
    buckets reached by flipping the sign bits with the SMALLEST
    hyperplane margin first — a near neighbor most likely differs on
    exactly the planes the query itself barely clears.

    Enumerates flip subsets of the lowest-margin planes, scores each
    by its summed margin, returns the ``n_probes`` best buckets
    (driver-side, O(n_probes log) work on a few dozen floats — nothing
    distributed)."""
    import heapq
    from itertools import combinations

    margins = np.abs(planes @ query_vec) / np.linalg.norm(planes, axis=1)
    order = np.argsort(margins)[: min(len(margins), 16)]
    scored: list[tuple[float, int]] = [(0.0, 0)]
    for r in range(1, max_flip_bits + 1):
        for bits in combinations(order.tolist(), r):
            mask = 0
            for j in bits:
                mask |= 1 << int(j)
            scored.append((float(sum(margins[list(bits)])), mask))
    best = heapq.nsmallest(n_probes, scored)
    return [query_bucket ^ mask for _, mask in best]


def ann_search(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_radius: int = 1,
    n_probes: int | None = None,
) -> DataFrame:
    """ANN: candidates from the query's LSH bucket (multiprobed), exact
    re-rank.

    Recall is tunable via n_planes (fewer planes -> bigger buckets)
    and the probe strategy — without multiprobe recall collapses as
    n_planes grows, because near neighbors that sit close to any one
    hyperplane land one bit away:

    * ``probe_radius`` — ALL buckets within Hamming r (exactly
      replicable in the SQL oracle via fixed XOR masks);
    * ``n_probes`` (overrides) — query-directed probing: the
      ``n_probes`` buckets whose flipped planes have the smallest
      query margins; far better recall per probe at large n_planes.

    Either way the candidate filter is ``bucket IN (probe set)`` — a
    single predicate-pushdown scan, no extra shuffle.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _hyperplanes(n_planes, len(query_vec), seed).astype(np.float64)
    qb = int(((planes @ q) > 0).astype(np.int64) @ (1 << np.arange(n_planes)))
    if n_probes is not None:
        probes = directed_probes(q, planes, qb, n_probes)
    else:
        probes = probe_buckets(qb, n_planes, probe_radius)
    bucketed = rp_lsh_buckets(df, len(query_vec), n_planes, seed, vec_col, id_col)
    cand = bucketed.filter(F.col("bucket").isin(probes)).drop("bucket")
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


# ---------------------------------------------------------------------------
# Product quantization (PQ): the embedding-column codec FAISS/ScaNN
# popularized. A d-dim float32 vector (4d bytes) compresses to m
# uint8 codes (m bytes — 32x at d=64, m=8) by splitting it into m
# subvectors and storing each subvector's nearest codeword id from a
# per-subspace k-means codebook. Search never reconstructs: ADC
# (asymmetric distance computation) sums per-subspace lookup-table
# distances straight off the codes.
#
# Scale shape: fitting samples the corpus once (driver-side Lloyd on
# the sample — the FAISS training recipe); encode/search are
# stateless vectorized passes whose (m, k, d/m) codebook rides the
# task closure like the IVF centroids, so the plan stays flat in both
# k and corpus size, and the scan they run over is m bytes/row, not
# 4d.
# ---------------------------------------------------------------------------


def _pq_split(mat: np.ndarray, m: int) -> np.ndarray:
    """(n, d) -> (n, m, d/m) contiguous subvector view."""
    n, d = mat.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    return mat.reshape(n, m, d // m)


def pq_fit(
    df: DataFrame,
    m: int = 8,
    k: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 20_000,
    iters: int = 15,
    seed: int = 42,
) -> np.ndarray:
    """Train the (m, k, d/m) PQ codebooks on a deterministic sample.

    The sample is HASH-ORDERED (the ``sample_rows`` lowest
    ``md5(id)`` vectors — Spark executes orderBy+limit as a
    per-partition partial top-k, so this never sorts the corpus):
    deterministic like a lowest-id sample, but unbiased when ids
    correlate with source/time (a sorted corpus would otherwise train
    the codebooks on one shard of the distribution — the
    stratified-sample trick from operators/sampling.py). Lloyd runs
    per subspace on the driver with seeded init, ties to the lowest
    codeword, empty clusters keeping their previous centroid — fully
    deterministic for a given (df, seed), so callers can persist the
    codebooks and every downstream code is re-derivable (the q33
    centroid-artifact pattern).
    """
    mat = _hash_order_sample(df, id_col, vec_col, sample_rows)
    return _lloyd_codebooks(mat, m, k, iters, seed)


def _hash_order_sample(
    df: DataFrame, id_col: str, vec_col: str, sample_rows: int
) -> np.ndarray:
    """Deterministic, order-unbiased training sample: the
    ``sample_rows`` vectors whose ``md5(id)`` sorts lowest (id as the
    tie-break). A pure function of the id SET — identical across
    re-runs, partitionings and engines."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_rows)
        .collect()
    )
    return np.array([r[1] for r in rows], dtype=np.float64)


def _lloyd_codebooks(
    mat: np.ndarray, m: int, k: int, iters: int, seed: int
) -> np.ndarray:
    """Per-subspace seeded Lloyd on a driver-side sample matrix —
    shared by :func:`pq_fit` (raw vectors) and :func:`ivfpq_fit`
    (coarse-quantizer residuals)."""
    if mat.shape[0] < k:
        raise ValueError(f"sample has {mat.shape[0]} rows < k={k} codewords")
    subs = _pq_split(mat, m)  # (n, m, sd)
    rs = np.random.RandomState(seed)
    books = []
    for s in range(m):
        x = subs[:, s, :]  # (n, sd)
        cents = x[rs.choice(x.shape[0], size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # lowest-index tie-break
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = x[mask].mean(axis=0)
        books.append(cents)
    return np.stack(books)  # (m, k, sd)


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Quantize: (id, codes array<smallint>) — codes[s] is the nearest
    codeword id in subspace s (argmin ||v_s - c||^2, ties to lowest
    cid via np.argmin). m bytes of information per vector; kept as
    smallint for engine-portable storage (the chunk codec dictionary-
    or bitpack-compresses it to ~log2(k) bits/code on disk)."""
    cb = np.ascontiguousarray(np.asarray(codebooks, dtype=np.float64))
    m, k, sd = cb.shape
    cc = (cb * cb).sum(axis=2)  # (m, k)

    @F.pandas_udf("array<smallint>")
    def codes(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        subs = _pq_split(mat, m)  # (b, m, sd)
        out = np.empty((mat.shape[0], m), dtype=np.int16)
        for s in range(m):
            d = cc[s] - 2.0 * (subs[:, s, :] @ cb[s].T)  # (b, k)
            out[:, s] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return df.select(F.col(id_col), codes(F.col(vec_col)).alias("codes"))


def pq_reconstruct(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    codes_col: str = "codes",
    id_col: str = "vec_id",
) -> DataFrame:
    """Decode codes back to the (lossy) codeword concatenation —
    the codec inverse used for round-trip distortion checks."""
    cb = np.ascontiguousarray(np.asarray(codebooks, dtype=np.float64))
    m, k, sd = cb.shape

    @F.pandas_udf("array<double>")
    def rec(c: pd.Series) -> pd.Series:
        idx = np.vstack(c.to_numpy()).astype(np.int64)  # (b, m)
        flat = cb[np.arange(m)[None, :], idx]  # (b, m, sd)
        return pd.Series(list(flat.reshape(idx.shape[0], m * sd)))

    return codes_df.select(F.col(id_col), rec(F.col(codes_col)).alias("vec"))


def pq_adc_lut(codebooks: np.ndarray, query_vec) -> np.ndarray:
    """(m, k) table of ||q_s - c||^2 — the per-query ADC lookup."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, k, sd = cb.shape
    qs = np.asarray(query_vec, dtype=np.float64).reshape(m, 1, sd)
    return ((qs - cb) ** 2).sum(axis=2)


def pq_search(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    query_vec,
    topk: int = 10,
    codes_col: str = "codes",
    id_col: str = "vec_id",
    round_digits: int = 5,
    use_udf: bool = True,
) -> DataFrame:
    """ADC top-k over PQ codes: distance = sum_s LUT[s, codes[s]].

    Two physical strategies (equivalent up to last-ulp summation
    order; results rounded for cross-engine stability):

    * ``use_udf=True`` (default, the scale path) — the (m, k) LUT
      rides the task closure into a vectorized take+sum;
    * ``use_udf=False`` — pure JVM expression: m ``element_at`` probes
      into array literals, folded left-to-right (the exact arithmetic
      a SQL oracle replicates; plan size O(m*k) literals, so only for
      small k).

    Either way the scan is over m smallint codes per row — the whole
    point of PQ at 100 TB: candidate generation without touching the
    4d-byte vectors.
    """
    lut = pq_adc_lut(codebooks, query_vec)
    m, k = lut.shape
    if use_udf:
        @F.pandas_udf("double")
        def ad2(c: pd.Series) -> pd.Series:
            idx = np.vstack(c.to_numpy()).astype(np.int64)  # (b, m)
            return pd.Series(lut[np.arange(m)[None, :], idx].sum(axis=1))

        dist = ad2(F.col(codes_col))
    else:
        dist = F.lit(0.0)
        for s in range(m):
            row = F.array(*[F.lit(float(x)) for x in lut[s]])
            dist = dist + F.element_at(
                row, F.col(codes_col)[s].cast("int") + 1
            )
    return (
        codes_df.select(
            F.col(id_col), F.round(dist, round_digits).alias("ad2")
        )
        .orderBy(F.col("ad2").asc(), F.col(id_col))
        .limit(topk)
    )


def pq_shortlist_rerank(
    df: DataFrame,
    codes_df: DataFrame,
    codebooks: np.ndarray,
    query_vec,
    k: int = 10,
    shortlist: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 5,
) -> DataFrame:
    """The full PQ search recipe: ADC over the m-byte codes produces a
    ``shortlist``-sized candidate set, which re-ranks EXACTLY against
    the float vectors. PQ's quantization error blurs fine ordering
    (codes can't rank vectors closer together than the codeword
    spacing), so top-k straight off ADC is approximate — but the true
    neighbors land comfortably inside a modest shortlist, and the
    re-rank touches only ``shortlist`` full-width vectors.

    At 100 TB: the scan that does the work reads m bytes/vector (the
    codes column), the shortlist is a broadcast semi-join back to the
    vector table, and the exact math runs on ``shortlist`` rows — the
    FAISS IVF-PQ + refine pattern as two DataFrame stages.
    """
    cand = pq_search(
        codes_df, codebooks, query_vec,
        topk=shortlist, id_col=id_col, round_digits=round_digits,
    ).select(id_col)
    qarr = F.array(*[F.lit(float(v)) for v in np.asarray(query_vec, dtype=np.float64)])
    diff2 = F.aggregate(
        F.zip_with(F.col(vec_col), qarr, lambda x, y: (x.cast("double") - y) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        df.join(F.broadcast(cand), id_col)
        .select(F.col(id_col), F.round(diff2, round_digits).alias("d2"))
        .orderBy(F.col("d2").asc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the production FAISS index shape — a coarse quantizer
# (ivf_fit_centroids) routes each vector to a list, and PQ encodes the
# RESIDUAL v - centroid[list]. Residuals are centered near zero with
# far less variance than raw vectors, so the same (m, k) budget
# quantizes them with materially less distortion; search probes the
# nprobe nearest lists and runs ADC with a PER-LIST lookup table built
# from the residual query q - centroid[list].
#
# Scale shape: the codes table is (id, list_id, m smallint) — written
# partitioned by list_id, the probe filter becomes parquet PARTITION
# PRUNING, so a query touches nprobe/k of the corpus at ~m bytes/row.
# Both the coarse centroids and the codebooks ride task closures; the
# plan is flat in k, nlist, and corpus size.
# ---------------------------------------------------------------------------


def ivfpq_fit(
    df: DataFrame,
    centroids: np.ndarray,
    m: int = 8,
    k: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 20_000,
    iters: int = 15,
    seed: int = 42,
) -> np.ndarray:
    """Train (m, k, d/m) codebooks on coarse-quantizer RESIDUALS of a
    deterministic sample (same hash-ordered sampling + Lloyd as
    :func:`pq_fit`, so the artifact-persistence story is identical
    and a source-sorted corpus cannot bias the codebooks)."""
    cent = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64))
    mat = _hash_order_sample(df, id_col, vec_col, sample_rows)
    d = cent @ mat.T  # not distances; do the proper argmin below
    cc = (cent * cent).sum(axis=1)  # (nlist,)
    assign = np.argmin(cc[:, None] - 2.0 * d, axis=0)  # (n,)
    residuals = mat - cent[assign]
    return _lloyd_codebooks(residuals, m, k, iters, seed)


def ivfpq_encode(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Quantize: (id, list_id, codes) in ONE vectorized pass — nearest
    coarse centroid (argmin, ties to lowest list), then per-subspace
    nearest residual codeword. Write the result partitioned by
    ``list_id`` so probe filters prune at the file level."""
    cent = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64))
    cb = np.ascontiguousarray(np.asarray(codebooks, dtype=np.float64))
    m, k, sd = cb.shape
    cc = (cent * cent).sum(axis=1)  # (nlist,)
    wcc = (cb * cb).sum(axis=2)  # (m, k)

    @F.pandas_udf("struct<list_id:int,codes:array<smallint>>")
    def enc(v: pd.Series) -> pd.DataFrame:
        mat = np.vstack(v.to_numpy()).astype(np.float64)  # (b, dim)
        assign = np.argmin(cc - 2.0 * (mat @ cent.T), axis=1)  # (b,)
        res = _pq_split(mat - cent[assign], m)  # (b, m, sd)
        out = np.empty((mat.shape[0], m), dtype=np.int16)
        for s in range(m):
            out[:, s] = np.argmin(wcc[s] - 2.0 * (res[:, s, :] @ cb[s].T), axis=1)
        return pd.DataFrame(
            {"list_id": assign.astype(np.int32), "codes": list(out)}
        )

    packed = df.select(F.col(id_col), enc(F.col(vec_col)).alias("_e"))
    return packed.select(
        id_col, F.col("_e.list_id").alias("list_id"), F.col("_e.codes").alias("codes")
    )


def ivfpq_search(
    codes_df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    query_vec,
    topk: int = 10,
    nprobe: int = 2,
    codes_col: str = "codes",
    id_col: str = "vec_id",
    round_digits: int = 5,
) -> DataFrame:
    """ADC top-k over the ``nprobe`` nearest lists with per-list LUTs:
    ad2(row) = sum_s LUT[list_id][s, codes[s]] where LUT[l] is built
    from the residual query q - centroid[l]. The list filter is an
    `isin` over the probed ids (partition pruning on a list-partitioned
    codes table); the (nprobe, m, k) LUT stack rides the task closure."""
    cent = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((cent - q) ** 2).sum(axis=1)
    probes = [int(i) for i in np.lexsort((np.arange(len(d2)), d2))[:nprobe]]
    luts = {l: pq_adc_lut(codebooks, q - cent[l]) for l in probes}
    m = np.asarray(codebooks).shape[0]

    @F.pandas_udf("double")
    def ad2(lid: pd.Series, c: pd.Series) -> pd.Series:
        idx = np.vstack(c.to_numpy()).astype(np.int64)  # (b, m)
        lids = lid.to_numpy()
        out = np.empty(len(lids), dtype=np.float64)
        for l in np.unique(lids):
            mask = lids == l
            out[mask] = luts[int(l)][
                np.arange(m)[None, :], idx[mask]
            ].sum(axis=1)
        return pd.Series(out)

    return (
        codes_df.filter(F.col("list_id").isin(probes))
        .select(
            F.col(id_col),
            F.round(ad2(F.col("list_id"), F.col(codes_col)), round_digits).alias("ad2"),
        )
        .orderBy(F.col("ad2").asc(), F.col(id_col))
        .limit(topk)
    )


def ivfpq_shortlist_rerank(
    df: DataFrame,
    codes_df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    query_vec,
    k: int = 10,
    nprobe: int = 2,
    shortlist: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 5,
) -> DataFrame:
    """IVF-PQ + refine: per-list ADC shortlist over the probed lists,
    exact L2 re-rank of ``shortlist`` full-width vectors via a
    broadcast semi-join (the :func:`pq_shortlist_rerank` recipe with
    partition-pruned candidate generation)."""
    cand = ivfpq_search(
        codes_df, centroids, codebooks, query_vec,
        topk=shortlist, nprobe=nprobe, id_col=id_col,
        round_digits=round_digits,
    ).select(id_col)
    qarr = F.array(*[F.lit(float(v)) for v in np.asarray(query_vec, dtype=np.float64)])
    diff2 = F.aggregate(
        F.zip_with(F.col(vec_col), qarr, lambda x, y: (x.cast("double") - y) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        df.join(F.broadcast(cand), id_col)
        .select(F.col(id_col), F.round(diff2, round_digits).alias("d2"))
        .orderBy(F.col("d2").asc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ): per-dimension affine int8 compression —
# code[d] = floor((v[d] - min[d]) / scale[d] + 0.5), scale = span/255.
# 4x smaller than float32 at ~1/510-of-span max error per dimension,
# and — unlike PQ — every stage (fit, encode, dequantize, search) is a
# pure JVM Column expression: zero Python anywhere in the row path,
# whole-stage codegen end to end. The FAISS "SQ8" flat-index codec.
#
# Scale shape: fit is ONE posexplode + groupBy(dim) min/max (a 64-row
# aggregate regardless of corpus size); encode/search are narrow
# zip_with scans with the (min, scale) arrays inlined as literals —
# no shuffle, no broadcast, no UDF worker.
# ---------------------------------------------------------------------------


def sq_fit(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (mins, scales) over the corpus: one
    posexplode(vec) -> groupBy(dim){min,max} aggregate (map-side
    combined; output rows == dim, so the collect is trivial).
    Constant dimensions get scale 0 — encode emits code 0 and
    dequantize returns the constant exactly."""
    stats = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>"))
                  .alias("dim", "val"))
        .groupBy("dim")
        .agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
        .orderBy("dim")
        .collect()
    )
    mins = np.array([r.lo for r in stats], dtype=np.float64)
    maxs = np.array([r.hi for r in stats], dtype=np.float64)
    return mins, (maxs - mins) / 255.0


def _sq_arrays(mins: np.ndarray, scales: np.ndarray):
    m = F.array(*[F.lit(float(x)) for x in np.asarray(mins, dtype=np.float64)])
    s = F.array(*[F.lit(float(x)) for x in np.asarray(scales, dtype=np.float64)])
    return m, s


def sq_encode(
    df: DataFrame,
    mins: np.ndarray,
    scales: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Quantize to (id, codes array<smallint>), codes in [0, 255] —
    pure JVM: two nested zip_with, floor(x + 0.5) rounding (identical
    on both engines, unlike HALF_UP/HALF_EVEN round()), clamp via
    least/greatest. smallint storage; the chunk codec bitpacks it to
    8 bits."""
    m, s = _sq_arrays(mins, scales)
    shifted = F.zip_with(
        F.col(vec_col), m, lambda x, mn: x.cast("double") - mn
    )
    codes = F.zip_with(
        shifted, s,
        lambda d, sc: F.when(sc == 0.0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(0),
                F.least(F.lit(255), F.floor(d / sc + 0.5).cast("int")),
            )
        ).cast("smallint"),
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def sq_dequantize(
    codes_df: DataFrame,
    mins: np.ndarray,
    scales: np.ndarray,
    codes_col: str = "codes",
    id_col: str = "vec_id",
) -> DataFrame:
    """Codec inverse: (id, vec array<double>) with vec[d] = min[d] +
    codes[d] * scale[d] (exact for constant dims)."""
    m, s = _sq_arrays(mins, scales)
    scaled = F.zip_with(
        F.col(codes_col), s, lambda c, sc: c.cast("double") * sc
    )
    deq = F.zip_with(scaled, m, lambda x, mn: x + mn)
    return codes_df.select(F.col(id_col), deq.alias("vec"))


def sq_topk(
    codes_df: DataFrame,
    mins: np.ndarray,
    scales: np.ndarray,
    query_vec,
    k: int = 10,
    codes_col: str = "codes",
    id_col: str = "vec_id",
    round_digits: int = 5,
) -> DataFrame:
    """Approximate L2 top-k straight off the int8 codes: dequantize
    inline and fold ||deq - q||^2 — one narrow JVM scan over 1/4 of
    the float bytes, no UDF. Quantization error is bounded by
    scale/2 per dimension, so unlike PQ the approximate ordering is
    near-exact; pair with :func:`pq_shortlist_rerank`'s recipe (a
    broadcast semi-join back to the float vectors) when exactness
    matters."""
    m, s = _sq_arrays(mins, scales)
    q = F.array(*[F.lit(float(v)) for v in np.asarray(query_vec, dtype=np.float64)])
    scaled = F.zip_with(F.col(codes_col), s, lambda c, sc: c.cast("double") * sc)
    deq = F.zip_with(scaled, m, lambda x, mn: x + mn)
    d2 = F.aggregate(
        F.zip_with(deq, q, lambda x, y: (x - y) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        codes_df.select(F.col(id_col), F.round(d2, round_digits).alias("ad2"))
        .orderBy(F.col("ad2").asc(), F.col(id_col))
        .limit(k)
    )
