"""Sequence packing + token statistics (operators/packing.py) and the
contamination report (operators/dedup.py)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from mojap_arrow_pd_parser_spark.operators import dedup
from mojap_arrow_pd_parser_spark.operators.packing import (
    doc_offsets,
    length_histogram,
    pack_sequences,
    token_vocab,
)


@pytest.fixture(scope="module")
def toks(spark):
    rng = np.random.Generator(np.random.Philox(key=[3, 1]))
    rows = []
    for i in range(300):
        n = int(rng.integers(0, 40))  # includes empty docs
        rows.append((f"d{i:05d}", [int(x) for x in rng.integers(0, 100, n)], n))
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int"
    ).cache()


class TestPacking:
    def test_offsets_are_exclusive_prefix_sums(self, spark, toks):
        got = {
            r.doc_id: r.tok_start
            for r in doc_offsets(spark, toks, n_buckets=8).collect()
        }
        acc = 0
        for r in sorted(toks.collect(), key=lambda r: r.doc_id):
            assert got[r.doc_id] == acc, r.doc_id
            acc += r.n_tok

    def test_pack_reconstructs_the_token_stream(self, spark, toks):
        """Concatenating the packed sequences in seq_id order must give
        exactly the concatenated token stream in doc_id order."""
        L = 64
        packed = sorted(
            pack_sequences(spark, toks, L).collect(), key=lambda r: r.seq_id
        )
        stream = []
        for r in sorted(toks.collect(), key=lambda r: r.doc_id):
            stream.extend(r.tokens)
        got = []
        for i, r in enumerate(packed):
            assert r.seq_id == i  # dense ids
            assert r.n_tokens == len(r.tokens)
            if i < len(packed) - 1:
                assert r.n_tokens == L  # all but the last are exactly L
            got.extend(r.tokens)
        assert got == stream
        # n_docs: each sequence counts its contributing docs
        assert all(r.n_docs >= 1 for r in packed)

    def test_pack_no_global_single_partition_sort(self, spark, toks):
        """The offsets stage must not contain an un-partitioned Window
        (single-reducer global sort): the plan's window specs all
        carry a partition key."""
        plan = doc_offsets(spark, toks, n_buckets=8)._jdf.queryExecution().toString()
        import re

        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            assert "_bucket" in m.group(1), m.group(0)

    def test_offsets_plan_flat_in_n_buckets(self, spark):
        """High bucket counts (100-TB shape: ~400k) must not embed an
        O(n_buckets) literal (create_map / boundary array) in the query
        plan: the prefix map is a broadcast JOIN and bucket assignment
        is the searchsorted path. Audit the optimized plan directly."""
        rng = np.random.Generator(np.random.Philox(key=[9, 2]))
        rows = [
            (f"d{i:06d}", [1, 2, 3], 3) for i in range(5000)
        ]
        df = spark.createDataFrame(
            rows, "doc_id string, tokens array<int>, n_tok int"
        )
        offs = doc_offsets(spark, df, n_buckets=2000)
        plan = offs._jdf.queryExecution().toString()
        assert "create_map" not in plan
        assert len(plan) < 100_000  # flat, not O(n_buckets) literals
        # and the offsets are still exact at this bucket count
        got = {r.doc_id: r.tok_start for r in offs.collect()}
        assert got[f"d{0:06d}"] == 0
        assert sorted(got.values()) == [3 * i for i in range(5000)]

    def test_vocab_matches_numpy(self, spark, toks):
        got = [(r.token, r.n) for r in token_vocab(toks, k=10).collect()]
        from collections import Counter

        c = Counter()
        for r in toks.collect():
            c.update(r.tokens)
        expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert got == expect

    def test_length_histogram(self, spark, toks):
        got = {r.len_bucket: r.n_docs for r in length_histogram(toks, 16).collect()}
        from collections import Counter

        expect = Counter(r.n_tok // 16 for r in toks.collect())
        assert got == dict(expect)


class TestContamination:
    def test_exact_copy_fully_contaminated_novel_clean(self, spark):
        train = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog"),
             (2, "pack my box with five dozen liquor jugs")],
            "doc_id long, text string",
        )
        eval_df = spark.createDataFrame(
            [(10, "the quick brown fox jumps over the lazy dog"),  # copy
             (11, "zz qq ww ee rr tt yy"),                          # novel
             (12, "with five dozen liquor jugs and more besides")], # partial
            "doc_id long, text string",
        )
        got = {
            r.eval_id: (r.n_shingles, r.n_contaminated)
            for r in dedup.ngram_contamination(train, eval_df, n=3).collect()
        }
        assert got[10][0] == got[10][1] > 0  # fully contaminated
        assert got[11][1] == 0 and got[11][0] > 0  # clean
        assert 0 < got[12][1] < got[12][0]  # partial overlap


class TestHashSplit:
    def test_deterministic_and_disjoint(self, spark, toks):
        from mojap_arrow_pd_parser_spark.operators.packing import hash_split

        a = {r.doc_id: r.split for r in hash_split(toks).collect()}
        b = {r.doc_id: r.split for r in hash_split(toks).collect()}
        assert a == b  # pure function of the id
        assert set(a.values()) <= {"train", "val"}
        n_val = sum(1 for v in a.values() if v == "val")
        assert 0 < n_val < len(a) * 0.2  # ~5% +/- sampling noise

    def test_md5_mode_matches_manual(self, spark):
        from mojap_arrow_pd_parser_spark.operators.packing import hash_split
        import hashlib

        df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
        got = {r.doc_id: r.split for r in hash_split(df, hash_mode="md5").collect()}
        for i in range(200):
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:7], 16)
            assert got[i] == ("val" if h % 100 < 5 else "train"), i


class TestSuggestNChunks:
    def test_scales_with_target(self, spark, toks):
        from mojap_arrow_pd_parser_spark.plans.chunking import suggest_n_chunks

        small = suggest_n_chunks(toks, "4KB")
        big = suggest_n_chunks(toks, "10MB")
        assert small > big >= 1

    def test_empty(self, spark):
        from mojap_arrow_pd_parser_spark.plans.chunking import suggest_n_chunks

        assert suggest_n_chunks(spark.createDataFrame([], "a int"), "1MB") == 1


class TestPackingEdges:
    def test_doc_spanning_many_sequences(self, spark):
        """A single document longer than several seq_lens must split
        across all spanned sequences with every token preserved."""
        rows = [
            ("a", list(range(10)), 10),
            ("b", list(range(100, 250)), 150),  # spans >4 sequences of 32
            ("c", list(range(500, 507)), 7),
        ]
        df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int")
        packed = sorted(
            pack_sequences(spark, df, 32, n_buckets=2).collect(),
            key=lambda r: r.seq_id,
        )
        stream = list(range(10)) + list(range(100, 250)) + list(range(500, 507))
        got = [t for r in packed for t in r.tokens]
        assert got == stream
        assert [r.n_tokens for r in packed[:-1]] == [32] * (len(packed) - 1)
        # middle sequences are fully inside doc b -> exactly 1 contributing doc
        assert any(r.n_docs == 1 for r in packed)

    def test_all_empty_docs(self, spark):
        df = spark.createDataFrame(
            [("a", [], 0), ("b", [], 0)], "doc_id string, tokens array<int>, n_tok int"
        )
        assert pack_sequences(spark, df, 16).count() == 0
