"""Public missing-value pair helper (``[R] py_stringsimjoin/utils/
missing_value_handler.py::get_pairs_with_missing_value``; SURVEY.md
§2.1 #14): rows whose attribute is null pair with every row of the
other table (they "could match anything")."""

from __future__ import annotations

from pyspark.sql import DataFrame

from .joins.core import missing_pairs, project_output


def get_pairs_with_missing_value(
    l_df: DataFrame,
    r_df: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_attr: str,
    r_attr: str,
    l_out_attrs: list[str] | None = None,
    r_out_attrs: list[str] | None = None,
    l_out_prefix: str = "l_",
    r_out_prefix: str = "r_",
) -> DataFrame:
    pairs = missing_pairs(l_df, r_df, l_key_attr, r_key_attr, l_attr, r_attr).drop(
        "_sim_score"
    )
    return project_output(
        pairs, l_df, r_df, l_key_attr, r_key_attr, l_out_attrs, r_out_attrs,
        l_out_prefix, r_out_prefix, out_sim_score=False,
    )
