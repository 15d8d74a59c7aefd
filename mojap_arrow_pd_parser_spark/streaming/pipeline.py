"""Structured Streaming pipelines.

* ``stream_encode`` — streaming ingest of tokens parquet into the
  encoder via ``foreachBatch`` + the resumable ``encode_table`` sink:
  the manifest sidecars make the sink idempotent, so replayed batches
  after a failure re-encode only unfinished chunks (exactly-once
  effect on top of at-least-once delivery).
* ``windowed_event_counts`` — watermarked event-time windowed
  aggregation (the standard late-data pattern); its batch-mode twin
  backs the oracle-checked q_stream_window query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import TOKENS_SCHEMA
from ..operators.encode import encode_table


def stream_encode(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key: str = "doc_id",
    n_chunks: int = 16,
    max_files_per_trigger: int = 8,
):
    """readStream(parquet) -> foreachBatch encode_table. Returns the query.

    Use ``trigger(availableNow=True)`` semantics: drains what exists,
    then stops — the batch/stream-unified form of the reference's
    chunked reader loop (_readers.py:147-158).

    Each micro-batch encodes into its OWN chunk-id generation
    (chunk_base = (epoch_id + 1) * GENERATION_STRIDE): epochs append
    instead of mistaking earlier epochs' buckets for already-done
    resume work (which silently dropped every multi-batch drain's
    later rows), and a RETRIED epoch reuses its base, so resume's
    skip-durable-chunks semantics make the sink exactly-once per epoch
    — the foreachBatch idempotence contract. Epoch generations start
    at 1 (matching ``stream_upsert``): generation 0 is reserved for a
    pre-existing batch-encoded base table, so streaming INTO such a
    table can never mistake the base table's buckets for epoch-0
    resume work and drop the epoch.
    """
    from ..operators.encode import GENERATION_STRIDE

    src = (
        spark.readStream.schema(TOKENS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        encode_table(
            batch_df.sparkSession, batch_df, out_dir, key=key,
            n_chunks=n_chunks, resume=True,
            chunk_base=(int(epoch_id) + 1) * GENERATION_STRIDE,
        )

    return (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_upsert(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
):
    """Streaming MERGE: a CDC-style update feed (full rows keyed by the
    table's plan key) applied to an EXISTING encoded table via
    ``foreachBatch`` + :func:`operators.encode.upsert_rows`, the epoch
    id serving as the upsert generation. A replayed epoch re-runs the
    SAME (batch, generation) pair, which upsert_rows makes convergent
    (its rewrite phase excludes the generation's own chunks; its append
    phase resumes) — exactly-once effect on at-least-once delivery,
    the same contract as :func:`stream_encode`.

    Epoch generations start at 1 (epoch_id + 1): generation 0 is the
    base table. Note upsert's documented read-uncommitted window
    applies per epoch.
    """
    from ..operators.encode import upsert_rows

    src = (
        spark.readStream.schema(TOKENS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_rows(
            batch_df.sparkSession, batch_df, out_dir,
            generation=int(epoch_id) + 1,
        )

    return (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


#: encoded chunk-file row schema (operators/encode.py CHUNK_FILE_SCHEMA)
ENCODED_ROWS_DDL = (
    "chunk_id int, column string, codec string, meta string, "
    "payload binary, n_rows bigint, in_bytes bigint, out_bytes bigint, "
    "crc32 string"
)


def stream_decode(
    spark: SparkSession,
    out_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
):
    """Streaming consumer of an encoded table: readStream over the
    chunk files -> per-batch codec decode -> parquet sink. Returns the
    query (``availableNow`` trigger: drains existing chunks, stops).

    Each source file IS one whole chunk, so every micro-batch holds
    complete chunks and decodes independently. Replay safety: each
    epoch writes ``sink_dir/epoch=<id>`` with overwrite, so a retried
    batch after a crash rewrites its own partition instead of
    appending duplicates (idempotent sink on top of the file source's
    checkpointed exactly-once file assignment).
    """
    import json as _json

    from pyspark.sql.types import StructType

    from ..operators.decode import decode_rows_df, load_plan

    plan = load_plan(out_dir)
    out_schema = StructType.fromJson(_json.loads(plan["schema_json"]))
    src = (
        spark.readStream.schema(ENCODED_ROWS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(f"{out_dir}/chunks")
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        enc = batch_df.select("chunk_id", "column", "meta", "payload", "crc32")
        decode_rows_df(enc, out_schema).write.mode("overwrite").parquet(
            f"{sink_dir}/epoch={epoch_id}"
        )

    return (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts_stream(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming watermarked windowed counts; memory-sink for smoke use."""
    events = spark.readStream.schema(schema).parquet(events_dir)
    # event-time watermarks require TIMESTAMP (not the parquet NTZ type);
    # session TZ is UTC so the cast is shift-free
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("windowed_event_counts")
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch twin of the streaming agg (same plan shape, oracle-checkable)."""
    return (
        events.groupBy(
            F.window("ts", window).getField("start").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
