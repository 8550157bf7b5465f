"""Transcript sources and cluster sinks.

Upstream ``py_stringsimjoin`` users hold their tables as pandas
DataFrames loaded from CSV; this engine's pipeline surface is the
transcripts table from BASELINE.json's input hint:

    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

``read_transcripts`` accepts parquet, CSV, JSON-lines, or an Iceberg
table name and returns that canonical shape. Scale notes:

- CSV/JSON are read with the EXPLICIT canonical schema, never
  ``inferSchema`` — inference is a full extra pass over the data
  (fatal at 100 TB) and its type guesses drift with the sample.
- Columns are cast to canonical types in-plan (no data pass of its
  own); the optional ``role``/``tool``/``ts`` columns materialize as
  typed nulls when the source lacks them, so every downstream stage
  sees one schema.
- Missing REQUIRED columns (conv_id, turn_idx, text) fail loudly at
  plan time, before any cluster resources are spent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

REQUIRED = ("conv_id", "turn_idx", "text")

_EXT_FORMATS = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".csv.gz": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
}


def infer_format(path: str) -> str:
    """Format from the path suffix; a suffix-less string is treated
    as an Iceberg/catalog table name (matching jobs/run_pipeline.py's
    long-standing convention)."""
    low = path.rstrip("/").lower()
    for ext, fmt in _EXT_FORMATS.items():
        if low.endswith(ext):
            return fmt
    return "parquet" if "/" in path else "table"


def read_transcripts(
    spark: SparkSession, path: str, fmt: str | None = None
) -> DataFrame:
    """Load a transcripts table from ``path`` in ``fmt`` (inferred
    from the suffix when None) and coerce it to TRANSCRIPT_SCHEMA.
    Raises ``ValueError`` when a required column is absent."""
    fmt = fmt or infer_format(path)
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "csv":
        sep = "\t" if path.rstrip("/").lower().endswith(".tsv") else ","
        df = spark.read.csv(
            path, header=True, schema=TRANSCRIPT_SCHEMA, sep=sep,
            timestampFormat="yyyy-MM-dd HH:mm:ss[.SSSSSS]",
            escape='"', multiLine=False,
        )
    elif fmt == "json":
        df = spark.read.json(path, schema=TRANSCRIPT_SCHEMA)
    elif fmt == "table":
        df = spark.read.table(path)
    else:
        raise ValueError(f"unknown transcripts format {fmt!r}")
    return coerce_transcripts(df)


def coerce_transcripts(df: DataFrame) -> DataFrame:
    """Cast any frame with the transcript columns to the canonical
    types; add typed-null optional columns; reject missing required
    ones. Pure projection — adds no job or shuffle."""
    present = {f.lower() for f in df.columns}
    missing = [c for c in REQUIRED if c not in present]
    if missing:
        raise ValueError(
            f"transcripts input is missing required column(s) {missing}; "
            f"found {sorted(df.columns)}"
        )
    cols = []
    for field in TRANSCRIPT_SCHEMA.fields:
        if field.name in present:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def write_output(df: DataFrame, path: str, fmt: str | None = None) -> None:
    """Write a result frame (e.g. clusters) as parquet/csv/json.
    Overwrite semantics match the pipeline's existing sink."""
    fmt = fmt or infer_format(path)
    w = df.write.mode("overwrite")
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "csv":
        w.option("header", True).csv(path)
    elif fmt == "json":
        w.json(path)
    else:
        raise ValueError(f"unknown output format {fmt!r}")
