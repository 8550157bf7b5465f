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
