"""EncodedTable facade: one lifecycle exercising every verb through
the single handle (each method is thin delegation — this test guards
the wiring, the operator tests guard the semantics)."""

from pyspark.sql import functions as F


def _tbl(spark, n, seed, prefix=""):
    from mojap_arrow_pd_parser_spark.datagen import tokens_table

    t = tokens_table(spark, n, seed=seed)
    if prefix:
        t = t.selectExpr(
            f"concat('{prefix}', doc_id) as doc_id", "tokens", "n_tok", "source"
        )
    return t


def test_full_lifecycle_through_facade(spark, tmp_path):
    from mojap_arrow_pd_parser_spark.table import EncodedTable

    path = str(tmp_path / "t")
    base = _tbl(spark, 500, 1)
    t = EncodedTable.create(
        spark, base, path, key="doc_id", n_chunks=4, track_snapshots=True
    )
    assert t.exists and t.plan["n_chunks"] == 4
    assert t.schema == base.schema
    assert t.verify(base)["mismatches"] == 0

    b = _tbl(spark, 200, 2, prefix="B")
    t.append(b, generation=1)
    assert t.read().count() == 700
    t.delete(("n_tok", 0, 40))
    post = base.unionAll(b).filter("n_tok not between 0 and 40")
    assert t.read().count() == post.count()

    # time travel + CDC + stats through the handle
    vs = [m["version"] for m in t.snapshots()]
    assert len(vs) == 3
    assert t.as_of(vs[1]).count() == 700
    ch = t.changes(vs[1], vs[2])
    assert ch.filter("_change = 'insert'").count() == 0
    st = t.stats(["n_tok"])
    assert st["n_rows"] == post.count()

    # pruned read + SQL view
    assert (
        t.read(where=[("n_tok", 100, 300)]).count()
        == post.filter("n_tok between 100 and 300").count()
    )
    t.sql_view("facade_t")
    n = spark.sql("SELECT count(*) AS n FROM facade_t").collect()[0].n
    assert n == post.count()

    # maintenance: recluster + expire + gc keep the table exact
    t.recluster(["n_tok", "source"], n_chunks=4)
    assert t.verify(post)["mismatches"] == 0
    t.expire_snapshots(keep_last=1)
    assert t.gc() > 0
    assert t.verify(post)["mismatches"] == 0
    assert repr(t).startswith("EncodedTable(")
