"""Structured Streaming ingestion of the turns table.

The reference is batch-only (SURVEY.md §2.H); streaming ingestion is the
engine extension that makes the KG pipeline incremental: turns arrive
continuously, extraction runs per micro-batch, and the triple store grows
append-only with dedup handled downstream by the canonicalization step.

Patterns used:
- `readStream` over a parquet/Iceberg directory of turns (schema pinned).
- stateless heads run inside `foreachBatch`, reusing the exact batch
  operators — one code path for batch and streaming (no drift).
- a stateful example: per-conversation session windows with watermark on
  `ts` (conversations "close" after `gap` of inactivity — the streaming
  analogue of document assembly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from dygiepp_spark.schemas import TURNS_SCHEMA


def read_turns_stream(spark: SparkSession, path: str, max_files: int = 10) -> DataFrame:
    return (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def conversation_sessions(
    turns_stream: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Stateful streaming doc assembly: one row per (conv, session window)
    with turn counts and token totals; late turns beyond the watermark drop
    (the streaming analogue of B1/B2 assembly)."""
    return (
        turns_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
    )


def make_batch_writer(out_dir: str):
    """foreachBatch handler: extract triples, write idempotently. A batch
    retried after a failure REPLACES its own batch_id partition (dynamic
    overwrite) instead of appending duplicates."""
    from dygiepp_spark.operators.extract import relation_triples

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = relation_triples(batch_df)
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            # per-write option, NOT session conf: mutating the shared
            # session's partitionOverwriteMode would silently change
            # overwrite semantics for unrelated writes in the same session
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return process


def start_streaming_triples(
    turns_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental triple extraction: per micro-batch, run the SAME batch
    extraction operators and write idempotently. foreachBatch is at-least-once
    (a batch retried after a failure re-runs `process`), so the write is a
    dynamic partition overwrite keyed by batch_id: a retry REPLACES its own
    partition instead of appending duplicates — effectively exactly-once at
    the file sink. Triple-level dedup across batches is a downstream batch
    step (canonicalize), as global dedup in-stream would need unbounded
    state."""
    process = make_batch_writer(out_dir)

    writer = (
        turns_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_turns_stream(turns_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup — the in-stream twin of the batch exact-dedup
    operator, for at-least-once producers that redeliver turns. Key =
    (conv_id, turn_idx, content hash); `dropDuplicatesWithinWatermark`
    keeps a seen-key only until the event-time watermark passes it, so
    dedup state is bounded by the disorder window, NOT by stream length —
    the property that lets this run forever at corpus scale. Duplicates
    farther apart than the watermark are downstream batch
    canonicalization's job (same contract as the triple-level dedup)."""
    return (
        turns_stream.withColumn("content_hash", F.xxhash64("text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx", "content_hash"])
        .drop("content_hash")
    )
