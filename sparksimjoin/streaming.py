"""Structured Streaming ingestion for transcripts (beyond the
reference — it is batch-only, SURVEY.md §2.4; this is the front door a
continuously-arriving transcript feed needs before the batch
record-linkage pipeline runs).

- ``stream_transcripts``: file-source stream of transcript turns with
  the canonical schema.
- ``ingest_transcripts``: watermarked, (conv_id, turn_idx)-deduplicated
  append into a parquet landing table via ``foreachBatch``. Dedup uses
  ``dropDuplicatesWithinWatermark`` so state for a key is EVICTED once
  the watermark passes it (plain dropDuplicates on non-event-time keys
  never evicts — unbounded state in a long-running stream). Writes are
  idempotent on micro-batch replay: each batch lands in its own
  ``_epoch=<id>`` partition with dynamic partition overwrite, so a
  restarted batch replaces itself instead of double-appending; the
  ``_epoch`` column doubles as per-batch lineage.
- ``streaming_turn_counts``: example stateful aggregation (per-role
  turn counts over event-time windows) used by tests to demonstrate
  watermark + windowed aggregation over the transcript feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def stream_transcripts(spark: SparkSession, source_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )


def make_batch_writer(target_dir: str):
    """Idempotent foreachBatch writer: epoch-keyed dynamic partition
    overwrite. Replaying epoch N (post-crash restart re-runs the last
    uncommitted batch) overwrites ``_epoch=N`` instead of appending a
    second copy. Exposed for direct unit testing."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("_epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(target_dir)
        )

    return write_batch


def ingest_transcripts(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
):
    """-> StreamingQuery appending watermarked, per-key-deduplicated
    turns to a parquet landing table. Call ``processAllAvailable()`` /
    ``stop()`` on the returned query (tests) or ``awaitTermination()``
    (production)."""
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )

    return (
        deduped.writeStream.foreachBatch(make_batch_writer(target_dir))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def streaming_turn_counts(stream: DataFrame, window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Windowed per-role turn counts (append-mode compatible)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )
