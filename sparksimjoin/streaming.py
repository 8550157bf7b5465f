"""Structured Streaming ingestion for transcripts (beyond the
reference — it is batch-only, SURVEY.md §2.4; this is the front door a
continuously-arriving transcript feed needs before the batch
record-linkage pipeline runs).

- ``stream_transcripts``: file-source stream of transcript turns with
  the canonical schema.
- ``ingest_transcripts``: watermarked, (conv_id, turn_idx)-deduplicated
  append into a parquet landing table via ``foreachBatch`` (idempotent
  per micro-batch: dedupe against the batch itself; late duplicates
  across batches are bounded by the watermark through
  ``dropDuplicatesWithinWatermark``-style dedup on the event time).
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
    deduped = (
        stream.withWatermark("ts", watermark)
        .dropDuplicates(["conv_id", "turn_idx"])
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(target_dir)

    return (
        deduped.writeStream.foreachBatch(write_batch)
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
