"""sparksimjoin/io.py: format-flexible transcript sources + sinks.

The upstream package's users hold CSV-loaded pandas tables
([R] py_stringsimjoin docs/tests load person-record CSVs); the
pipeline equivalent is reading the transcripts table from CSV/JSON
with the canonical schema enforced and NO inference pass.
"""

from __future__ import annotations

import pytest

from sparksimjoin.fixtures import make_transcripts
from sparksimjoin.io import (
    TRANSCRIPT_SCHEMA,
    coerce_transcripts,
    infer_format,
    read_transcripts,
    write_output,
)


def _canon(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"])
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def transcripts(spark):
    pdf, _ = make_transcripts(n_conv=40, seed=7)
    return spark.createDataFrame(pdf)


def test_infer_format():
    assert infer_format("/a/b.parquet") == "parquet"
    assert infer_format("/a/b.csv") == "csv"
    assert infer_format("/a/b.CSV") == "csv"
    assert infer_format("/a/b.tsv") == "csv"
    assert infer_format("/a/b.jsonl") == "json"
    assert infer_format("/a/dir/") == "parquet"  # suffix-less path: parquet dir
    assert infer_format("catalog.db.transcripts") == "table"


@pytest.mark.parametrize("fmt,ext", [("parquet", "parquet"), ("csv", "csv"),
                                     ("json", "jsonl")])
def test_roundtrip_formats(spark, transcripts, tmp_path, fmt, ext):
    """Write the same fixture in each format, read it back through
    read_transcripts, and require identical rows + canonical schema.
    ts is excluded from the row compare (csv/json serialize it at
    different precisions) but must come back as a timestamp type."""
    path = str(tmp_path / f"t.{ext}")
    write_output(transcripts.select(*[f.name for f in TRANSCRIPT_SCHEMA.fields]),
                 path, fmt=fmt)
    back = read_transcripts(spark, path)
    assert [f.name for f in back.schema.fields] == [
        f.name for f in TRANSCRIPT_SCHEMA.fields
    ]
    assert back.schema["turn_idx"].dataType.typeName() == "integer"
    assert back.schema["ts"].dataType.typeName() == "timestamp"
    assert _canon(back) == _canon(transcripts)


def test_coerce_adds_optional_and_casts(spark):
    df = spark.createDataFrame(
        [("c1", "0", "hello world")], "conv_id string, turn_idx string, text string"
    )
    out = coerce_transcripts(df)
    assert [f.name for f in out.schema.fields] == [
        f.name for f in TRANSCRIPT_SCHEMA.fields
    ]
    row = out.collect()[0]
    assert row["turn_idx"] == 0 and row["role"] is None and row["ts"] is None


def test_missing_required_column_fails_loudly(spark):
    df = spark.createDataFrame([("c1", 0)], "conv_id string, turn_idx int")
    with pytest.raises(ValueError, match="text"):
        coerce_transcripts(df)


def test_csv_read_is_schema_on_read_no_inference(spark, transcripts, tmp_path):
    """The CSV reader must carry the explicit canonical schema —
    at scale inferSchema is an extra full pass. Assert the planned
    scan's read schema matches TRANSCRIPT_SCHEMA without running an
    inference job (the read itself succeeding with exact types on an
    ambiguous column is the observable: turn_idx stays IntegerType,
    not the LongType inference would produce)."""
    path = str(tmp_path / "t.csv")
    write_output(transcripts.select(*[f.name for f in TRANSCRIPT_SCHEMA.fields]),
                 path, fmt="csv")
    back = read_transcripts(spark, path)
    assert back.schema == TRANSCRIPT_SCHEMA


def test_pipeline_runs_from_csv(spark, transcripts, tmp_path):
    """End-to-end: the pipeline consumes a CSV-sourced frame and
    produces the same clusters as the parquet-sourced one."""
    from sparksimjoin.pipeline import PipelineConfig, run_pipeline

    pq = str(tmp_path / "t.parquet")
    cs = str(tmp_path / "t.csv")
    base = transcripts.select(*[f.name for f in TRANSCRIPT_SCHEMA.fields])
    write_output(base, pq, fmt="parquet")
    write_output(base, cs, fmt="csv")
    a = run_pipeline(spark, read_transcripts(spark, pq), str(tmp_path / "w1"),
                     PipelineConfig(threshold=0.6))
    b = run_pipeline(spark, read_transcripts(spark, cs), str(tmp_path / "w2"),
                     PipelineConfig(threshold=0.6))
    ra = sorted((r["conv_id"], r["component"]) for r in a.collect())
    rb = sorted((r["conv_id"], r["component"]) for r in b.collect())
    assert ra == rb
