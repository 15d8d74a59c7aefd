"""Contract tests for the gated Iceberg integration (sources/iceberg.py).

The sandbox image ships no iceberg-spark-runtime jar, so the real
catalog path cannot be exercised here (documented limitation; the
parquet chunk+manifest layout preserves the commit semantics). These
tests pin the GATE's contract so a runtime that does have the jar
gets the real path and one that doesn't fails fast with actionable
guidance instead of an opaque ClassNotFoundException mid-job.
"""

from __future__ import annotations

import pytest

from mojap_arrow_pd_parser_spark.sources import iceberg


def test_gate_detects_missing_runtime(spark):
    # this image has no iceberg jar on the classpath
    assert iceberg.iceberg_available(spark) is False


def test_read_raises_with_guidance(spark):
    with pytest.raises(NotImplementedError, match="iceberg-spark-runtime"):
        iceberg.read_table(spark, "cat.db.tokens")


def test_write_raises_with_guidance(spark):
    df = spark.range(3)
    with pytest.raises(NotImplementedError, match="chunk\\+manifest"):
        iceberg.write_table(df, "cat.db.tokens")


def test_gate_flips_when_class_present(spark, monkeypatch):
    """If the runtime IS present, the gate must route through (the
    detection is a classpath probe, so fake it at the probe seam)."""
    monkeypatch.setattr(iceberg, "iceberg_available", lambda s: True)
    # read_table then calls spark.table, which fails on the (absent)
    # catalog — but NOT with the gate's NotImplementedError: the gate
    # itself let it through.
    with pytest.raises(Exception) as ei:
        iceberg.read_table(spark, "nosuch_catalog.db.tokens")
    assert not isinstance(ei.value, NotImplementedError)
