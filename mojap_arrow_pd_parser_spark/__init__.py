"""mojap_arrow_pd_parser_spark — a PySpark-native per-column
lightweight-compression engine.

Generalizes the schema-conformance + round-trip contract of
``moj-analytical-services/mojap-arrow-pd-parser`` (reference at
``/root/reference``, see SURVEY.md) into a lakehouse columnar encoder:

* ``functions.codecs`` — pure numpy/pyarrow codec kernels (dictionary,
  RLE, FSST symbol-table, bit-packing, frame-of-reference delta) with
  sampled cost estimation and auto-selection. No Spark dependency.
* ``functions.conform`` — the reference's caster semantics
  (``/root/reference/arrow_pd_parser/caster.py``) re-expressed as a
  single ``df.select`` of Spark Column expressions.
* ``operators.encode`` / ``operators.decode`` — vectorized
  ``mapInArrow`` encode/decode over range-planned chunks, with
  per-partition lineage manifests and checkpoint resume.
* ``sources`` / ``operators`` extras — reader/writer facade (CSV /
  JSONL / Parquet, format inference), dedup, similarity search, text
  analysis for training-data pipelines.
* ``streaming`` — Structured Streaming encode pipeline.
* ``operators.snapshots`` — versioned snapshots: time travel
  (``as_of`` by version or tag), incremental/CDC reads
  (``table_changes``), retention (``expire_snapshots`` + tag pinning).
* ``sources.datasource`` — the ``mojap_encoded`` Spark Python
  DataSource: SQL reads with Catalyst filter pushdown into the
  zone-map/Bloom chunk prune, arrow-batch writes, streaming source.
* ``table.EncodedTable`` — every verb on one handle.

Everything is DataFrame API + Arrow-vectorized UDFs: zero per-row
Python in any hot path.
"""

__version__ = "0.1.0"

from .table import EncodedTable  # noqa: E402,F401 (public facade)
