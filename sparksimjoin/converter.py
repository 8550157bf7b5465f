"""Numeric-to-string column converters (``[R] py_stringsimjoin/utils/
converter.py::dataframe_column_to_str``; SURVEY.md §2.1 #15).

Float columns holding integral values render without the trailing
``.0`` (the reference's int-float NaN-handling behavior: a pandas int
column with NaNs becomes float; converting back to str must yield
'12', not '12.0'). Nulls stay null."""

from __future__ import annotations

import math

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


def series_to_str(series, inplace: bool = False):
    """pandas twin (``[R] py_stringsimjoin/utils/converter.py::
    series_to_str``): render a numeric Series as strings with the
    reference's int-float behavior — a float that is integral prints
    without the trailing '.0' (because a pandas int column with NaNs
    is stored as float), NaN/None stay missing. ``inplace`` is
    accepted for signature parity; pandas Series cannot be converted
    in place across dtypes, so a new Series is always returned (the
    reference mutates its parent DataFrame instead)."""

    def conv(v):
        if v is None or (isinstance(v, float) and v != v):
            return None
        # isfinite guard: int(inf) raises OverflowError, and the
        # integrality check below would evaluate it
        if isinstance(v, float) and math.isfinite(v) and v == int(v):
            return str(int(v))
        return str(v)

    del inplace  # see docstring
    return series.map(conv)


def dataframe_column_to_str(df, col: str, inplace: bool = False):
    """pandas-DataFrame twin of column_to_str for reference drop-in
    compatibility (``[R] utils/converter.py::dataframe_column_to_str``)."""
    out = series_to_str(df[col])
    if inplace:
        df[col] = out
        return None
    df2 = df.copy()
    df2[col] = out
    return df2
