"""Numeric-to-string column converters (``[R] py_stringsimjoin/utils/
converter.py::dataframe_column_to_str``; SURVEY.md §2.1 #15).

Float columns holding integral values render without the trailing
``.0`` (the reference's int-float NaN-handling behavior: a pandas int
column with NaNs becomes float; converting back to str must yield
'12', not '12.0'). Nulls stay null."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_to_str(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    out_col = out_col or col
    dtype = dict(df.dtypes)[col]
    c = F.col(col)
    if dtype in ("double", "float"):
        as_str = F.when(
            c.isNotNull() & (c == F.floor(c)), c.cast("long").cast("string")
        ).otherwise(c.cast("string"))
    else:
        as_str = c.cast("string")
    return df.withColumn(out_col, as_str)
