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


def build_reference_index(
    static_df: DataFrame,
    t_key_attr: str,
    t_join_attr: str,
    tokenizer,
    measure: str,
    threshold: float,
) -> DataFrame:
    """Batch-side prefix index of a STATIC reference table for
    :func:`match_stream_against_reference`: one row per (prefix token,
    reference record) with the record's hashed verify array riding
    along — (token, __t_id, __t_hashed, __t_sz).

    Tokens are ordered by corpus rarity (df asc, token asc — the
    engine's global order) before taking the prefix; the ONE-SIDED
    prefix bound is order-free for soundness (if a probe shares no
    token with prefix(y), overlap <= |y| - p < the measure's required
    overlap — derivations match filter_math.prefix_length), rarity
    ordering just minimizes index selectivity."""
    from .filter_math import EDIT_DISTANCE, prefix_length_expr
    from .joins.core import build_token_ranks

    if measure.upper() == EDIT_DISTANCE:
        raise ValueError("reference matching covers set measures; "
                         "EDIT_DISTANCE blocking is size-band-structured")
    tok = tokenizer.with_return_set(True)
    tok_df = (static_df.where(F.col(t_join_attr).isNotNull())
              .select(F.col(t_key_attr).alias("__t_id"),
                      tok.spark_expr(F.col(t_join_attr)).alias("__toks"))
              .where(F.size("__toks") > 0))
    ranks = build_token_ranks([tok_df.select(F.col("__t_id").alias("id"),
                                             F.col("__toks").alias("toks"))])
    ordered = (tok_df.select("__t_id", F.explode("__toks").alias("token"))
               .join(ranks.select("token", "tid"), "token")
               .groupBy("__t_id")
               .agg(F.array_sort(F.collect_list(F.struct("tid", "token")))
                    .alias("__tt")))
    rec = ordered.select(
        "__t_id",
        F.expr("transform(__tt, x -> x.token)").alias("__ord"),
    ).select(
        "__t_id", "__ord",
        F.size("__ord").alias("__t_sz"),
        F.array_sort(F.transform(F.col("__ord"), lambda x: F.xxhash64(x)))
        .alias("__t_hashed"),
    )
    plen = prefix_length_expr(F.col("__t_sz"), measure.upper(), threshold)
    return rec.select(
        "__t_id", "__t_sz", "__t_hashed",
        F.explode(F.slice("__ord", 1, plen)).alias("token"),
    ).select("token", "__t_id", "__t_sz", "__t_hashed")


def match_stream_against_reference(
    stream: DataFrame,
    static_df: DataFrame,
    s_key_attr: str,
    t_key_attr: str,
    s_join_attr: str,
    t_join_attr: str,
    tokenizer,
    measure: str,
    threshold: float,
    event_time: str = "ts",
    watermark: str = "10 minutes",
    index: DataFrame | None = None,
) -> DataFrame:
    """PURE-DECLARATIVE streaming entity matching against a fixed
    reference catalog — no foreachBatch, no streaming aggregation:

    1. probe records tokenize + hash per ROW (Column exprs only);
    2. every probe token equi-joins the reference's one-sided PREFIX
       index (a stream-static inner join — broadcast when the index is
       small, shuffled otherwise);
    3. exact sim_expr verify per joined row (JVM codegen);
    4. a pair meeting through k shared prefix tokens is collapsed by
       ``dropDuplicatesWithinWatermark`` — state is EVICTED once the
       watermark passes (bounded state in a long-running stream, the
       same lever as ingest_transcripts).

    Contrast with ``link_transcript_stream`` (continuous incremental
    linkage of the stream against ITSELF via checkpointed batches):
    this is the "match incoming records against a master catalog"
    shape, and the whole thing is one Catalyst streaming plan.

    ``index``: a prebuilt :func:`build_reference_index` frame. When
    omitted, the index is built here and PERSISTED (cache.track) —
    stream-static joins re-execute the static plan every trigger, and
    the index build (token ranks + ordering) is far too heavy to pay
    per micro-batch; release with ``sparksimjoin.release_all`` (or
    pass your own checkpointed index) when the query stops.

    -> streaming DataFrame(s_<key>, t_<key>, _sim_score, <event_time>).
    """
    from .cache import track
    from .filter_math import COMP_OP_MAP, sim_expr
    from .validation import validate_threshold

    measure = measure.upper()
    validate_threshold(threshold, measure)
    if index is None:
        index = track(build_reference_index(static_df, t_key_attr, t_join_attr,
                                            tokenizer, measure, threshold))
    tok = tokenizer.with_return_set(True)
    toks = tok.spark_expr(F.col(s_join_attr))
    probes = (
        stream.withWatermark(event_time, watermark)
        .where(F.col(s_join_attr).isNotNull())
        .select(
            F.col(s_key_attr).alias("__s_id"),
            F.col(event_time).alias("__ts"),
            toks.alias("__s_toks"),
        )
        .where(F.size("__s_toks") > 0)
        .select(
            "__s_id", "__ts",
            F.array_sort(F.transform(F.col("__s_toks"),
                                     lambda x: F.xxhash64(x))).alias("__s_hashed"),
            F.explode("__s_toks").alias("token"),
        )
    )
    joined = probes.join(index, "token")
    scored = joined.withColumn(
        "_sim_score", sim_expr(F.col("__s_hashed"), F.col("__t_hashed"), measure)
    ).where(COMP_OP_MAP[">="](F.col("_sim_score"), F.lit(float(threshold))))
    out = scored.select(
        F.col("__s_id").alias(f"s_{s_key_attr}"),
        F.col("__t_id").alias(f"t_{t_key_attr}"),
        "_sim_score",
        F.col("__ts").alias(event_time),
    )
    return out.dropDuplicatesWithinWatermark([f"s_{s_key_attr}", f"t_{t_key_attr}"])
