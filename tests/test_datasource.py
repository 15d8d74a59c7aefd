"""Spark Python DataSource over encoded tables (sources/datasource.py):
batch read with filter pushdown into zone-map/bloom pruning, SQL
surface, arrow batch writer through the commit protocol, and the
append-only streaming reader over snapshot history."""

import json

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def registered(spark):
    from mojap_arrow_pd_parser_spark.sources import datasource

    datasource.register(spark)
    return spark


def _tbl(spark, n, seed, prefix=""):
    from mojap_arrow_pd_parser_spark.datagen import tokens_table

    t = tokens_table(spark, n, seed=seed)
    if prefix:
        t = t.selectExpr(
            f"concat('{prefix}', doc_id) as doc_id", "tokens", "n_tok", "source"
        )
    return t


def _encode(spark, tmp_path, n=600, seed=1, n_chunks=6, **kw):
    from mojap_arrow_pd_parser_spark.operators.encode import encode_table

    out = str(tmp_path / "enc")
    src = _tbl(spark, n, seed)
    encode_table(spark, src, out, key="doc_id", n_chunks=n_chunks, **kw)
    return out, src


class TestBatchRead:
    def test_full_scan_roundtrip(self, registered, tmp_path):
        spark = registered
        out, src = _encode(spark, tmp_path)
        got = spark.read.format("mojap_encoded").load(out)
        assert got.count() == 600
        assert got.schema == src.schema
        assert got.exceptAll(src).count() == 0
        assert src.exceptAll(got).count() == 0

    def test_sql_surface(self, registered, tmp_path):
        spark = registered
        out, src = _encode(spark, tmp_path)
        spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW enc_sql "
            f"USING mojap_encoded OPTIONS (path '{out}')"
        )
        row = spark.sql(
            "SELECT count(*) AS n, sum(n_tok) AS s FROM enc_sql"
        ).collect()[0]
        exp = src.agg(F.count("*"), F.sum("n_tok")).collect()[0]
        assert (row.n, row.s) == (exp[0], exp[1])

    def test_filter_pushdown_prunes_partitions(self, registered, tmp_path):
        spark = registered
        out, src = _encode(spark, tmp_path, n=800, n_chunks=8)
        probe = src.orderBy("doc_id").limit(1).collect()[0].doc_id
        df = spark.read.format("mojap_encoded").load(out).filter(
            F.col("doc_id") == probe
        )
        assert df.count() == 1
        # the scan must plan O(1) chunk partitions, not all 8
        from mojap_arrow_pd_parser_spark.sources.datasource import (
            EncodedTableReader,
        )
        from pyspark.sql.datasource import EqualTo

        r = EncodedTableReader({"path": out}, src.schema)
        r.pushFilters([EqualTo(("doc_id",), probe)])
        assert 1 <= len(r.partitions()) <= 2

    def test_range_and_in_pushdown_rows_exact(self, registered, tmp_path):
        spark = registered
        out, src = _encode(spark, tmp_path, n=700, n_chunks=7)
        enc = spark.read.format("mojap_encoded").load(out)
        got = enc.filter("n_tok > 50 AND n_tok <= 300")
        exp = src.filter("n_tok > 50 AND n_tok <= 300")
        assert got.count() == exp.count()
        ids = [r.doc_id for r in src.limit(4).collect()]
        got2 = enc.filter(F.col("doc_id").isin(ids))
        assert got2.count() == 4
        # one-sided + IN both went through the reader without error and
        # Spark still row-filters (pushFilters returns all filters)

    def test_one_sided_pushdown_planning(self, registered, tmp_path):
        spark = registered
        out, src = _encode(spark, tmp_path, n=600, n_chunks=6)
        from mojap_arrow_pd_parser_spark.sources.datasource import (
            EncodedTableReader,
        )
        from pyspark.sql.datasource import GreaterThan

        hi = src.agg(F.max("n_tok")).collect()[0][0]
        r = EncodedTableReader({"path": out}, src.schema)
        r.pushFilters([GreaterThan(("n_tok",), hi + 1)])
        assert r.partitions() == []  # provably disjoint everywhere

    def test_as_of_option(self, registered, tmp_path):
        spark = registered
        from mojap_arrow_pd_parser_spark.operators.encode import delete_rows

        out, src = _encode(spark, tmp_path, track_snapshots=True)
        delete_rows(spark, out, where=("n_tok", 0, 100))
        live = spark.read.format("mojap_encoded").load(out)
        old = (
            spark.read.format("mojap_encoded")
            .option("as_of", "1").load(out)
        )
        assert old.count() == 600
        assert live.count() == src.filter("n_tok not between 0 and 100").count()

    def test_missing_path_raises(self, registered):
        spark = registered
        with pytest.raises(Exception, match="path"):
            spark.read.format("mojap_encoded").load()


class TestBatchWrite:
    def test_write_then_engine_reads(self, registered, tmp_path):
        spark = registered
        out = str(tmp_path / "written")
        src = _tbl(spark, 500, 9).repartition(5)
        src.write.format("mojap_encoded").option("key", "doc_id").mode("append").save(out)
        from mojap_arrow_pd_parser_spark.operators.decode import (
            decode_table, verify_roundtrip,
        )

        assert verify_roundtrip(spark, src, out)["mismatches"] == 0
        plan = json.load(open(f"{out}/plan.json"))
        assert plan["mode"] == "datasource"
        assert plan["key_type"] == "string"
        # and the datasource can read its own output
        back = spark.read.format("mojap_encoded").load(out)
        assert back.count() == 500
        assert decode_table(spark, out).count() == 500

    def test_write_without_overwrite_refuses_existing(
        self, registered, tmp_path
    ):
        spark = registered
        out, _src = _encode(spark, tmp_path)
        with pytest.raises(Exception, match="overwrite|already"):
            _tbl(spark, 10, 2).write.format("mojap_encoded").mode(
                "append"
            ).save(out)

    def test_overwrite_replaces(self, registered, tmp_path):
        spark = registered
        out = str(tmp_path / "written")
        _tbl(spark, 300, 3).repartition(3).write.format(
            "mojap_encoded"
        ).mode("append").save(out)
        _tbl(spark, 100, 4).repartition(2).write.format(
            "mojap_encoded"
        ).mode("overwrite").save(out)
        assert spark.read.format("mojap_encoded").load(out).count() == 100


class TestStreamRead:
    def test_appends_stream_as_microbatches(self, registered, tmp_path):
        spark = registered
        from mojap_arrow_pd_parser_spark.operators.encode import (
            delete_rows, encode_append,
        )

        out, src = _encode(spark, tmp_path, n=400, track_snapshots=True)
        sink = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")

        def drain(**opts):
            reader = spark.readStream.format("mojap_encoded")
            for k, v in opts.items():
                reader = reader.option(k, v)
            q = (
                reader.load(out)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(120)
            finally:
                q.stop()

        drain()
        got0 = spark.read.parquet(sink)
        assert got0.count() == 400  # v1 = the initial encode

        b = _tbl(spark, 150, 2, prefix="B")
        encode_append(spark, b, out, generation=1)
        drain()
        got1 = spark.read.parquet(sink)
        assert got1.count() == 550  # the appended generation streamed
        assert (
            got1.filter(F.col("doc_id").startswith("B"))
            .exceptAll(b).count() == 0
        )

        # a rewrite in the window is ambiguous -> default FAILS loudly
        delete_rows(spark, out, where=("n_tok", 0, 50))
        with pytest.raises(Exception, match="ignoreChanges|ignoreDeletes"):
            drain()
        # ignoreDeletes: rewrite outputs skipped, stream stays clean
        drain(ignoreDeletes="true")
        assert spark.read.parquet(sink).count() == 550
        drain()  # fully drained: another restart adds nothing
        assert spark.read.parquet(sink).count() == 550

    def test_untracked_table_refuses_stream(self, registered, tmp_path):
        spark = registered
        out, _src = _encode(spark, tmp_path)
        with pytest.raises(Exception, match="track_snapshots"):
            q = (
                spark.readStream.format("mojap_encoded").load(out)
                .writeStream.format("noop")
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(120)  # surfaces the async failure
            finally:
                q.stop()
