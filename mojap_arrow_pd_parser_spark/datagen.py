"""Deterministic synthetic tokens table (FIXTURES.md F1).

Schema (BASELINE.json input_hint):
    doc_id:string, tokens:array<int32>, n_tok:int32, source:string

Generation is fully distributed (``spark.range`` -> ``mapInArrow``) and
**partitioning-independent**: every row is derived from a counter-based
Philox stream keyed by (seed, doc index), so the same (seed, n_docs)
yields bit-identical rows at any parallelism — required for the
two-cluster-size scaling evidence and for kill/rerun resume tests.

Five codec-stressing token regimes, chosen by doc index % 5:
  0 RLE   — long runs of a repeated token
  1 dict  — small vocabulary (<=256 distinct)
  2 delta — near-monotone increasing ids
  3 pack  — uniform small range (bit-packable)
  4 adv   — uniform over full int32 (incompressible)
plus empty and length-1 arrays sprinkled in. ``source`` is ~70% one hot
value (skew, exercises salting).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

TOKENS_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"

SOURCES = [
    "common_crawl",  # ~70% of rows — the skewed hot key
    "wikipedia",
    "books",
    "arxiv",
    "github",
    "stackexchange",
    "news",
    "forums",
    "patents",
    "web_misc",
]
_SOURCE_P = np.array([0.70] + [0.30 / 9] * 9)


def _gen_row(rng: np.random.Generator, idx: int, avg_len: int) -> np.ndarray:
    regime = idx % 5
    if idx % 97 == 0:
        return np.zeros(0, dtype=np.int32)  # empty array edge
    if idx % 89 == 0:
        return rng.integers(0, 2**31 - 1, 1).astype(np.int32)  # singleton
    n = int(min(8192, max(1, rng.lognormal(np.log(avg_len), 0.6))))
    if regime == 0:  # RLE: few long runs
        n_runs = max(1, n // int(rng.integers(16, 64)))
        vals = rng.integers(0, 50_000, n_runs)
        reps = rng.multinomial(n - n_runs, np.ones(n_runs) / n_runs) + 1
        return np.repeat(vals, reps).astype(np.int32)
    if regime == 1:  # dict: small vocab
        vocab = rng.integers(0, 2**31 - 1, int(rng.integers(4, 256)))
        return rng.choice(vocab, n).astype(np.int32)
    if regime == 2:  # delta: near-monotone
        start = int(rng.integers(0, 2**20))
        return (start + np.cumsum(rng.integers(0, 7, n))).astype(np.int32)
    if regime == 3:  # bitpack: small range
        width = int(rng.integers(4, 17))
        return rng.integers(0, 1 << width, n).astype(np.int32)
    # adversarial: full-range incl. negatives
    return rng.integers(-(2**31), 2**31 - 1, n, dtype=np.int64).astype(np.int32)


def _batch_rows(ids: np.ndarray, seed: int, avg_len: int) -> pa.RecordBatch:
    doc_ids = []
    token_arrays = []
    sources = []
    for i in ids.tolist():
        rng = np.random.Generator(np.random.Philox(key=[seed, i]))
        toks = _gen_row(rng, i, avg_len)
        doc_ids.append(f"doc_{i:012d}")
        token_arrays.append(toks)
        sources.append(SOURCES[int(rng.choice(len(SOURCES), p=_SOURCE_P))])
    flat = (
        np.concatenate(token_arrays)
        if token_arrays
        else np.zeros(0, dtype=np.int32)
    )
    offsets = np.zeros(len(token_arrays) + 1, dtype=np.int32)
    np.cumsum([len(t) for t in token_arrays], out=offsets[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.int32())
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            tokens,
            pa.array(offsets[1:] - offsets[:-1], type=pa.int32()),
            pa.array(sources, type=pa.string()),
        ],
        names=["doc_id", "tokens", "n_tok", "source"],
    )


def tokens_table(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    avg_len: int = 256,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic tokens DataFrame (lazy)."""
    partitions = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, numPartitions=partitions)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(0).to_numpy()
            yield _batch_rows(ids, seed, avg_len)

    return base.mapInArrow(gen, schema=TOKENS_SCHEMA)


EMBEDDINGS_SCHEMA = "vec_id long, cluster int, embedding array<float>"


def _mog_centroids(k: int, dim: int, seed: int) -> np.ndarray:
    """(k, dim) unit-norm mixture centroids, Philox-derived so every
    executor (and the driver-side query builder) regenerates them
    identically — nothing to broadcast."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0xC3]))
    c = rng.standard_normal((k, dim))
    return (c / np.linalg.norm(c, axis=1, keepdims=True)).astype(np.float64)


def clustered_embeddings(
    spark: SparkSession,
    n_rows: int,
    dim: int = 64,
    k: int = 32,
    seed: int = 7,
    noise: float = 0.05,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic mixture-of-Gaussians embedding table — REAL
    cluster structure, unlike the driver testdata's isotropic vectors
    where recall can never beat the scanned fraction (any index's
    information-theoretic ceiling on structureless data). Each row is
    centroid[cluster] + noise*N(0,I), counter-keyed per vec_id, so the
    same (seed, n_rows) is bit-identical at any parallelism. With the
    default noise, within-cluster cosine ~0.85 vs cross-cluster ~0 —
    separable, so ANN recall measurably exceeds scan fraction."""
    partitions = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, numPartitions=partitions)
    cents = _mog_centroids(k, dim, seed)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(0).to_numpy()
            clusters = np.empty(len(ids), dtype=np.int32)
            vecs = np.empty((len(ids), dim), dtype=np.float32)
            for j, i in enumerate(ids.tolist()):
                rng = np.random.Generator(np.random.Philox(key=[seed, i]))
                c = int(rng.integers(0, k))
                clusters[j] = c
                vecs[j] = (
                    cents[c] + noise * rng.standard_normal(dim)
                ).astype(np.float32)
            emb = pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), type=pa.float32()), dim
            ).cast(pa.list_(pa.float32()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(clusters, type=pa.int32()),
                    emb,
                ],
                names=["vec_id", "cluster", "embedding"],
            )

    return base.mapInArrow(gen, schema=EMBEDDINGS_SCHEMA)


def clustered_query_vec(
    dim: int = 64, k: int = 32, seed: int = 7, noise: float = 0.05,
    cluster: int = 0,
) -> list[float]:
    """A held-out query drawn from the SAME mixture component (counter
    key -1, so it is no table row): the realistic ANN workload — the
    answer set concentrates in one cluster."""
    cents = _mog_centroids(k, dim, seed)
    rng = np.random.Generator(np.random.Philox(key=[seed, 2**63 - 1]))
    return (
        (cents[cluster] + noise * rng.standard_normal(dim))
        .astype(np.float32).tolist()
    )


def write_reference_parquet(
    spark: SparkSession, n_docs: int, path: str, seed: int = 42, avg_len: int = 256
) -> None:
    """Materialize the tokens table as parquet-snappy — the size baseline.

    snappy is the reference repo's own writer default
    (/root/reference/arrow_pd_parser/_writers.py:310-311).
    """
    df = tokens_table(spark, n_docs, seed=seed, avg_len=avg_len)
    df.write.mode("overwrite").option("compression", "snappy").parquet(path)
