"""Facade reader (S1-S8): format-dispatch scan + conform layer.

The reference reads CSV as all-string then casts
(/root/reference/arrow_pd_parser/_readers.py:181-187) so the metadata
cast is the *only* typing step. Spark-first translation: an all-string
explicit schema on the scan (no double inference), then
``cast_spark_table_to_schema`` — Catalyst folds both into one
whole-stage-codegen scan stage, and unused columns are pruned before
ever being cast.

S3/remote dispatch (utils.py:42-46) is free: Hadoop FS URIs
(``s3a://``, ``hdfs://``) pass straight through ``spark.read``.
Chunked reading (S7) is native: Spark partitions are the chunks;
``chunksize`` maps to ``maxPartitionBytes``/repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.conform import cast_spark_table_to_schema
from .inference import CSV, JSONL, PARQUET, human_to_bytes, infer_file_format

# CSV dialect options accepted by the reference's pandas/arrow readers
# (tests/test_str_conformance.py:30-65) -> Spark csv options
_CSV_OPTION_MAP = {
    "sep": "sep", "delimiter": "sep",
    "quote": "quote", "quote_char": "quote",
    "escape": "escape", "escape_char": "escape",
    "nullValue": "nullValue", "null_values": "nullValue",
    "encoding": "encoding",
    "multiLine": "multiLine",
    "header": "header",
}


def read(
    spark: SparkSession,
    input_path: str,
    metadata: dict | None = None,
    file_format: str | None = None,
    *,
    expect_full_schema: bool = True,
    chunksize: int | str | None = None,
    nrows: int | None = None,
    ignore_unnamed_columns: bool = False,
    conform_options: dict | None = None,
    **options,
) -> DataFrame:
    """Read CSV/JSONL/Parquet (local or remote URI) and conform to metadata.

    ``nrows`` limits the result to the first n rows after conform — the
    reference passes it through to pandas (README.md:70); here it is
    ``df.limit(n)``, which Spark pushes into the scan (LocalLimit per
    task, no full read).
    """
    fmt = file_format or infer_file_format(input_path, metadata)
    if fmt == CSV:
        df = _read_csv(spark, input_path, metadata, **options)
    elif fmt == JSONL:
        df = _read_jsonl(spark, input_path, metadata, **options)
    elif fmt == PARQUET:
        df = spark.read.parquet(input_path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")

    if ignore_unnamed_columns:  # P5 (_readers.py:189-192)
        keep = [c for c in df.columns if not c.startswith("Unnamed:")]
        df = df.select(*keep)

    if metadata is not None:
        df = cast_spark_table_to_schema(
            df,
            metadata,
            expect_full_schema=expect_full_schema,
            **(conform_options or {}),
        )
    if nrows is not None:
        df = df.limit(int(nrows))
    if chunksize is not None:
        df = repartition_by_chunksize(df, chunksize)
    return df


def repartition_by_chunksize(df: DataFrame, chunksize: int | str) -> DataFrame:
    """Spark partitions ARE the chunks (S7).

    ``chunksize=65536`` -> ~65536 rows per partition; ``"500MB"`` ->
    probe 1000 rows for bytes/row then size partitions to the byte
    target — the reference's memory-string probe
    (/root/reference/arrow_pd_parser/reader.py:53-61, utils.py:113-132).
    """
    import math

    total = df.count()
    if total == 0:
        return df
    if isinstance(chunksize, str):
        target_bytes = human_to_bytes(chunksize)
        probe = df.limit(1000).toPandas()
        bpr = max(1.0, float(probe.memory_usage(deep=True).sum()) / max(len(probe), 1))
        rows_per_chunk = max(1, int(target_bytes / bpr))
    else:
        rows_per_chunk = max(1, int(chunksize))
    return df.repartition(max(1, math.ceil(total / rows_per_chunk)))


def _read_csv(spark, path, metadata, **options):
    opts = {"header": "true"}
    for k, v in options.items():
        opts[_CSV_OPTION_MAP.get(k, k)] = v
    reader = spark.read.options(**opts)
    if metadata is not None:
        # read-as-string-then-cast: explicit all-string schema, the single
        # well-defined typing step happens in the conform select. Column
        # names come from the FILE header (a header-only probe), not the
        # metadata — a metadata column absent from the file must raise in
        # the conform layer (caster.py:568-569), not appear as nulls.
        names = spark.read.options(**opts).csv(path).columns
        schema = T.StructType([T.StructField(n, T.StringType(), True) for n in names])
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", "true").csv(path)


def _read_jsonl(spark, path, metadata, **options):
    reader = spark.read.options(**options)
    if metadata is not None:
        # JSON scalars arrive as strings; nested meta types keep structure
        from ..functions.conform import meta_type_to_spark

        fields = []
        for c in metadata["columns"]:
            t = meta_type_to_spark(c["type"])
            if isinstance(t, (T.ArrayType, T.StructType, T.MapType)):
                fields.append(T.StructField(c["name"], t, True))
            else:
                fields.append(T.StructField(c["name"], T.StringType(), True))
        return reader.schema(T.StructType(fields)).json(path)
    return reader.json(path)
