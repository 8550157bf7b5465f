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


def make_linkage_batch_handler(workdir_root: str, base_workdir: str | None = None,
                               config=None):
    """foreachBatch handler that runs CONTINUOUS record linkage: each
    micro-batch of conversation-COMPLETE transcripts is linked against
    everything seen so far via ``incremental.run_incremental``,
    chaining one checkpoint dir per epoch under ``workdir_root``
    (epoch N's dir is epoch N+1's base). The first batch bootstraps
    with ``run_pipeline`` unless ``base_workdir`` points at an
    existing completed run.

    Input contract: a conversation's turns must arrive WITHIN one
    micro-batch (incremental linkage requires batch-disjoint conv_ids
    — a conv split across epochs raises). Sessionize upstream (e.g.
    ``ingest_transcripts`` landing table + a conversation-completeness
    trigger) before linking.

    Replay-idempotent: a restarted epoch re-enters its own dir — if
    its clusters stage is already complete it is a no-op; if it died
    mid-stage, completed stages are read back (the CheckpointManager
    resume contract). Exposed as a factory (like ``make_batch_writer``)
    for direct unit testing without a running stream.
    """
    import os

    from .checkpoint import CheckpointManager
    from .incremental import run_incremental
    from .pipeline import PipelineConfig, run_pipeline

    cfg = config or PipelineConfig()

    def _completed_head(spark) -> str | None:
        if not os.path.isdir(workdir_root):
            return None
        done = sorted(
            d for d in os.listdir(workdir_root)
            if d.startswith("batch_")
            and CheckpointManager(spark, os.path.join(workdir_root, d)).exists("clusters")
        )
        return os.path.join(workdir_root, done[-1]) if done else base_workdir

    def link_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        wd = os.path.join(workdir_root, f"batch_{int(epoch_id):012d}")
        if CheckpointManager(spark, wd).exists("clusters"):
            return  # replay of a fully-committed epoch
        head = _completed_head(spark)
        if head is None:
            run_pipeline(spark, batch_df, wd, cfg)
        else:
            run_incremental(spark, batch_df, head, wd, cfg)

    return link_batch


def link_transcript_stream(
    stream: DataFrame,
    workdir_root: str,
    checkpoint_dir: str,
    base_workdir: str | None = None,
    config=None,
):
    """-> StreamingQuery running continuous incremental linkage over a
    conversation-complete transcript stream (see
    ``make_linkage_batch_handler`` for the batch contract). The latest
    full-corpus cluster assignment after each epoch is the ``clusters``
    stage of the newest ``batch_*`` dir under ``workdir_root``."""
    return (
        stream.writeStream.foreachBatch(
            make_linkage_batch_handler(workdir_root, base_workdir, config)
        )
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
