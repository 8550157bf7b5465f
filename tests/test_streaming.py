from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sparksimjoin.fixtures import make_transcripts
from sparksimjoin.streaming import (
    ingest_transcripts,
    stream_transcripts,
    streaming_turn_counts,
)


@pytest.fixture()
def source_dir(tmp_path):
    pdf, _ = make_transcripts(n_conv=50, seed=5)
    src = tmp_path / "src"
    src.mkdir()
    # two files, with a duplicated block to exercise dedup
    t = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(t, str(src / "a.parquet"), coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    dup = pa.Table.from_pandas(pdf.head(40), preserve_index=False)
    pq.write_table(dup, str(src / "b.parquet"), coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    return str(src), len(pdf)


def test_streaming_ingest_dedupes(spark, tmp_path, source_dir):
    src, n_unique = source_dir
    target = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    q = ingest_transcripts(stream_transcripts(spark, src), target, ckpt)
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(target)
    assert out.count() == n_unique
    assert out.select("conv_id", "turn_idx").distinct().count() == n_unique


def test_streaming_turn_counts(spark, source_dir):
    src, _ = source_dir
    agg = streaming_turn_counts(stream_transcripts(spark, src))
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("turn_counts")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from turn_counts").collect()
    # append mode only emits closed windows; with a bounded source the
    # final watermark never advances past the last event, so rows may
    # be empty — the assertion is that the query runs and the schema is
    # stable (the plumbing works); complete-mode coverage below
    assert [f.name for f in agg.schema.fields] == [
        "window_start", "window_end", "role", "n_turns"
    ]
    q2 = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName("turn_counts_complete")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    total = spark.sql("select sum(n_turns) as s from turn_counts_complete").collect()[0]["s"]
    assert total is not None and total > 0


def test_batch_writer_idempotent_on_replay(spark, tmp_path):
    """foreachBatch replay of the same epoch (post-crash restart)
    must overwrite its own partition, not double-append."""
    from sparksimjoin.streaming import make_batch_writer

    target = str(tmp_path / "landing2")
    write = make_batch_writer(target)
    df = spark.range(10).selectExpr("id", "CAST(id AS STRING) AS v")
    write(df, 0)
    write(df, 0)          # replayed epoch
    write(df.limit(5), 1) # next epoch
    out = spark.read.parquet(target)
    assert out.count() == 15
    assert out.where("_epoch = 0").count() == 10


def test_streaming_linkage_matches_full_batch(spark, tmp_path):
    """Continuous linkage: two conversation-complete micro-batches
    through make_linkage_batch_handler == one full run_pipeline over
    the union; a replayed epoch is a no-op (same clusters)."""
    import os

    from sparksimjoin.pipeline import PipelineConfig, run_pipeline
    from sparksimjoin.streaming import make_linkage_batch_handler
    from sparksimjoin.checkpoint import CheckpointManager

    cfg = PipelineConfig(threshold=0.6)
    pdf, _ = make_transcripts(n_conv=120, seed=11)
    convs = sorted(pdf["conv_id"].unique())
    cut = set(convs[:80])
    b1 = spark.createDataFrame(pdf[pdf.conv_id.isin(cut)])
    b2 = spark.createDataFrame(pdf[~pdf.conv_id.isin(cut)])
    root = str(tmp_path / "link")
    handler = make_linkage_batch_handler(root, config=cfg)
    handler(b1, 0)
    handler(b2, 1)

    def head_clusters():
        done = sorted(d for d in os.listdir(root) if d.startswith("batch_"))
        df = CheckpointManager(spark, os.path.join(root, done[-1])).read("clusters")
        return sorted((r["conv_id"], r["component"]) for r in df.collect())

    rows_stream = head_clusters()
    full = run_pipeline(spark, spark.createDataFrame(pdf),
                        str(tmp_path / "full"), cfg)
    rows_full = sorted((r["conv_id"], r["component"]) for r in full.collect())
    assert rows_stream == rows_full

    handler(b2, 1)  # replayed committed epoch: no-op
    assert head_clusters() == rows_full


def test_link_transcript_stream_end_to_end(spark, tmp_path):
    """Drive the real writeStream surface: one file per trigger ->
    two linkage epochs; final clusters match the batch pipeline."""
    import os

    from sparksimjoin.pipeline import PipelineConfig, run_pipeline
    from sparksimjoin.streaming import link_transcript_stream
    from sparksimjoin.checkpoint import CheckpointManager

    cfg = PipelineConfig(threshold=0.6)
    pdf, _ = make_transcripts(n_conv=60, seed=13)
    convs = sorted(pdf["conv_id"].unique())
    cut = set(convs[:40])
    src = tmp_path / "src"
    src.mkdir()
    for name, sel in (("a", pdf.conv_id.isin(cut)), ("b", ~pdf.conv_id.isin(cut))):
        pq.write_table(pa.Table.from_pandas(pdf[sel], preserve_index=False),
                       str(src / f"{name}.parquet"), coerce_timestamps="us",
                       allow_truncated_timestamps=True)
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src / "a.parquet")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    root = str(tmp_path / "link")
    q = link_transcript_stream(stream, root, str(tmp_path / "ckpt"), config=cfg)
    q.processAllAvailable()
    q.stop()

    done = sorted(d for d in os.listdir(root) if d.startswith("batch_"))
    assert len(done) == 2
    got = CheckpointManager(spark, os.path.join(root, done[-1])).read("clusters")
    rows_stream = sorted((r["conv_id"], r["component"]) for r in got.collect())
    full = run_pipeline(spark, spark.createDataFrame(pdf), str(tmp_path / "full"), cfg)
    rows_full = sorted((r["conv_id"], r["component"]) for r in full.collect())
    assert rows_stream == rows_full


def test_stream_reference_matching(spark, tmp_path):
    """Pure-declarative stream-vs-static matching: brute-force parity
    on a tiny catalog + the multi-prefix-token meet collapses to one
    output row (dropDuplicatesWithinWatermark)."""
    import datetime

    import pandas as pd

    from sparksimjoin import WhitespaceTokenizer
    from sparksimjoin.streaming import match_stream_against_reference

    static_rows = [(100, "alpha beta gamma"), (101, "delta eps"),
                   (102, "alpha beta"), (103, None)]
    static = spark.createDataFrame(static_rows, ["ref_id", "name"])
    ts0 = datetime.datetime(2026, 8, 19, 12, 0, 0)
    probe_rows = [(1, "alpha beta gamma", ts0), (2, "zeta delta eps", ts0),
                  (3, "omega psi", ts0), (4, None, ts0)]
    src = tmp_path / "probes"
    src.mkdir()
    pdf = pd.DataFrame(probe_rows, columns=["probe_id", "name", "ts"])
    pa_t = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(pa_t, str(src / "p.parquet"), coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    probe_stream = (
        spark.readStream.schema("probe_id bigint, name string, ts timestamp")
        .parquet(str(src))
    )
    out = match_stream_against_reference(
        probe_stream, static, "probe_id", "ref_id", "name", "name",
        WhitespaceTokenizer(), "JACCARD", 0.5,
    )
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("ref_matches").start())
    q.processAllAvailable()
    q.stop()
    raw_rows = spark.sql("select * from ref_matches").collect()
    got = {(r.s_probe_id, r.t_ref_id): r._sim_score for r in raw_rows}

    # brute force
    exp = {}
    for pid, ptext, _ in probe_rows:
        if ptext is None:
            continue
        ps = set(ptext.split())
        for rid, rtext in static_rows:
            if rtext is None:
                continue
            rs = set(rtext.split())
            j = len(ps & rs) / len(ps | rs)
            if j >= 0.5:
                exp[(pid, rid)] = pytest.approx(j)
    assert got == exp
    # probe 1 and ref 100 share three tokens (several prefix meets):
    # the RAW sink row count proves dropDuplicatesWithinWatermark
    # collapsed them — without it the sink holds one row per shared
    # prefix token
    assert (1, 100) in got
    assert len(raw_rows) == len(exp)
