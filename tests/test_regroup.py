"""Streaming per-chunk regroup (operators/regroup.py): correctness,
laziness (peak working set ~1 chunk), and the contiguity contract."""

from __future__ import annotations

import pyarrow as pa
import pytest

from mojap_arrow_pd_parser_spark.operators.regroup import iter_contiguous_groups


def _batch(ids, vals):
    return pa.RecordBatch.from_arrays(
        [pa.array(ids, pa.int32()), pa.array(vals, pa.int64())],
        names=["chunk_id", "v"],
    )


class TestIterContiguousGroups:
    def test_groups_and_contents(self):
        batches = [
            _batch([1, 1], [10, 11]),
            _batch([1], [12]),
            _batch([2, 3, 3], [20, 30, 31]),  # id change inside a batch
            _batch([], []),
            _batch([3], [32]),
        ]
        got = [
            (gid, t.column("v").to_pylist())
            for gid, t in iter_contiguous_groups(iter(batches), "chunk_id")
        ]
        assert got == [(1, [10, 11, 12]), (2, [20]), (3, [30, 31, 32])]

    def test_streaming_peak_is_one_group(self):
        """Each group is yielded BEFORE later groups' batches are pulled
        from the input — the whole partition is never buffered."""
        consumed = []

        def feed():
            for i, b in enumerate(
                [_batch([1], [1]), _batch([1], [2]), _batch([2], [3]),
                 _batch([3], [4]), _batch([3], [5])]
            ):
                consumed.append(i)
                yield b

        it = iter_contiguous_groups(feed(), "chunk_id")
        gid, _ = next(it)
        assert gid == 1
        # group 1 complete after reading just its batches + one lookahead
        assert len(consumed) == 3
        gid, _ = next(it)
        assert gid == 2
        assert len(consumed) == 4

    def test_non_contiguous_raises(self):
        batches = [_batch([1], [1]), _batch([2], [2]), _batch([1], [3])]
        with pytest.raises(ValueError, match="not contiguous"):
            list(iter_contiguous_groups(iter(batches), "chunk_id"))

    def test_empty_input(self):
        assert list(iter_contiguous_groups(iter([]), "chunk_id")) == []

    def test_single_group_many_batches(self):
        batches = [_batch([7], [i]) for i in range(50)]
        out = list(iter_contiguous_groups(iter(batches), "chunk_id"))
        assert len(out) == 1
        assert out[0][0] == 7
        assert out[0][1].num_rows == 50


def test_decode_partition_streams_multi_chunk_scan(spark, tmp_path):
    """End-to-end: a single scan partition holding MANY chunks decodes
    correctly through the streaming regroup (coalesce(1) forces all
    chunk files into one task)."""
    from pyspark.sql import functions as F

    from mojap_arrow_pd_parser_spark.datagen import tokens_table
    from mojap_arrow_pd_parser_spark.operators.decode import decode_table
    from mojap_arrow_pd_parser_spark.operators.encode import encode_table

    src = tokens_table(spark, 600, seed=5, avg_len=32)
    out = str(tmp_path / "enc")
    encode_table(spark, src, out, key="doc_id", n_chunks=12)
    dec = decode_table(spark, out).coalesce(1)
    assert dec.count() == 600
    a = src.agg(F.sum("n_tok")).collect()[0][0]
    b = dec.agg(F.sum("n_tok")).collect()[0][0]
    assert a == b
