"""Input validation (``[R] py_stringsimjoin/utils/validation.py``;
SURVEY.md §2.2 #30). Schema-level checks are always on (cheap,
driver-side); data-level key-uniqueness is a separate helper that
runs a job, so callers/tests opt in (``assert_unique_key``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .filter_math import (
    COSINE,
    DICE,
    EDIT_DISTANCE,
    JACCARD,
    OVERLAP,
    OVERLAP_COEFFICIENT,
)

_SET_SIM_COMP_OPS = (">=", ">", "=")
_EDIT_COMP_OPS = ("<=", "<", "=")


def validate_attr(df: DataFrame, attr: str, table_name: str = "table") -> None:
    assert attr in df.columns, f"attribute {attr!r} not found in {table_name} ({df.columns})"


def validate_join_inputs(
    l_df: DataFrame,
    r_df: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_join_attr: str,
    r_join_attr: str,
    l_out_attrs: list[str] | None = None,
    r_out_attrs: list[str] | None = None,
) -> None:
    validate_attr(l_df, l_key_attr, "left table")
    validate_attr(l_df, l_join_attr, "left table")
    validate_attr(r_df, r_key_attr, "right table")
    validate_attr(r_df, r_join_attr, "right table")
    l_type = dict(l_df.dtypes)[l_join_attr]
    r_type = dict(r_df.dtypes)[r_join_attr]
    assert l_type == "string", f"left join attr must be string, got {l_type}"
    assert r_type == "string", f"right join attr must be string, got {r_type}"
    for a in l_out_attrs or []:
        validate_attr(l_df, a, "left table")
    for a in r_out_attrs or []:
        validate_attr(r_df, a, "right table")


def validate_threshold(threshold: float, measure: str) -> None:
    if measure in (JACCARD, COSINE, DICE, OVERLAP_COEFFICIENT):
        assert 0 < threshold <= 1, f"{measure} threshold must be in (0, 1], got {threshold}"
    elif measure == OVERLAP:
        assert threshold > 0, f"OVERLAP threshold must be > 0, got {threshold}"
    elif measure == EDIT_DISTANCE:
        assert threshold >= 0, f"EDIT_DISTANCE threshold must be >= 0, got {threshold}"
    else:
        raise AssertionError(f"unknown measure {measure}")


def validate_comp_op_for_sim_measure(comp_op: str, measure: str) -> None:
    allowed = _EDIT_COMP_OPS if measure == EDIT_DISTANCE else _SET_SIM_COMP_OPS
    assert comp_op in allowed, f"comp_op {comp_op!r} invalid for {measure} (allowed {allowed})"


def assert_unique_key(df: DataFrame, key_attr: str) -> None:
    """Data-level check: key is unique and non-null (runs a job)."""
    dup = (
        df.groupBy(key_attr).count().where(F.col("count") > 1).limit(1).count()
    )
    assert dup == 0, f"key attribute {key_attr!r} is not unique"
    nnull = df.where(F.col(key_attr).isNull()).limit(1).count()
    assert nnull == 0, f"key attribute {key_attr!r} contains nulls"
