from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparksimjoin import WhitespaceTokenizer, jaccard_join
from sparksimjoin.converter import column_to_str
from sparksimjoin.filters import PrefixFilter
from sparksimjoin.fixtures import make_person_tables
from sparksimjoin.matcher import apply_matcher
from sparksimjoin.naive import naive_set_sim_join
from sparksimjoin.profiler import profile_table_for_join

A_PDF, B_PDF = make_person_tables(40, 50, seed=3)
WS = WhitespaceTokenizer()


@pytest.fixture(scope="module")
def tables(spark):
    a = spark.createDataFrame(A_PDF).cache()
    b = spark.createDataFrame(B_PDF).cache()
    a.count(), b.count()
    return a, b


def test_apply_matcher_reproduces_join(spark, tables):
    """apply_matcher on a candset reproduces direct-join scores
    (reference matcher test — SURVEY.md §5.1)."""
    a, b = tables
    cand = PrefixFilter(WS, "JACCARD", 0.5).filter_tables(a, b, "id", "id", "name", "name")
    matched = apply_matcher(
        cand, "l_id", "r_id", a, b, "id", "id", "name", "name", WS, "JACCARD", 0.5
    )
    got = {(r["l_id"], r["r_id"]): r["_sim_score"] for r in matched.collect()}
    # allow_empty=True: the scorer gives empty-empty pairs sim 1.0
    # (py_stringmatching convention), and the candset contains them
    expected = {
        (l, r): s
        for l, r, s in naive_set_sim_join(
            A_PDF, B_PDF, "id", "id", "name", "name", WS, 0.5, "JACCARD", allow_empty=True
        )
    }
    assert set(got) == set(expected)
    for k in expected:
        assert math.isclose(got[k], expected[k], abs_tol=1e-9)


def test_apply_matcher_callable(spark, tables):
    a, b = tables
    cand = PrefixFilter(WS, "JACCARD", 0.5).filter_tables(a, b, "id", "id", "name", "name")

    def jac(lt, rt):
        sa, sb = set(lt), set(rt)
        if not sa and not sb:
            return 1.0
        if not sa or not sb:
            return 0.0
        return len(sa & sb) / len(sa | sb)

    m_builtin = apply_matcher(cand, "l_id", "r_id", a, b, "id", "id", "name", "name", WS, "JACCARD", 0.5)
    m_callable = apply_matcher(cand, "l_id", "r_id", a, b, "id", "id", "name", "name", WS, jac, 0.5)
    p1 = {(r["l_id"], r["r_id"]) for r in m_builtin.collect()}
    p2 = {(r["l_id"], r["r_id"]) for r in m_callable.collect()}
    assert p1 == p2


def test_apply_matcher_edit_distance(spark, tables):
    a, b = tables
    cand = PrefixFilter(WS, "JACCARD", 0.1).filter_tables(a, b, "id", "id", "name", "name")
    m = apply_matcher(cand, "l_id", "r_id", a, b, "id", "id", "name", "name", None,
                      "EDIT_DISTANCE", 3, comp_op="<=")
    for r in m.collect():
        assert r["_sim_score"] <= 3


def test_profiler(spark, tables):
    a, _ = tables
    rep = {r["attribute"]: r.asDict() for r in profile_table_for_join(a).collect()}
    assert rep["id"]["unique_count"] == len(A_PDF)
    assert rep["id"]["missing_count"] == 0
    assert "key attribute" in rep["id"]["comment"]
    assert rep["name"]["missing_count"] == 1  # the injected null name


def test_converter(spark):
    df = spark.createDataFrame(
        [(1, 12.0, "a"), (2, 12.5, None), (3, None, "c")],
        "id int, v double, s string",
    )
    out = {r["id"]: r["v2"] for r in column_to_str(df, "v", "v2").collect()}
    assert out[1] == "12"       # integral float -> no trailing .0
    assert out[2] == "12.5"
    assert out[3] is None


def test_dense_id_output(spark, tables):
    a, b = tables
    df = jaccard_join(a, b, "id", "id", "name", "name", WS, 0.5, dense_id=True)
    ids = sorted(r["_id"] for r in df.select("_id").collect())
    assert ids == list(range(len(ids)))


def test_get_pairs_with_missing_value(spark, tables):
    from sparksimjoin import get_pairs_with_missing_value

    a, b = tables
    out = get_pairs_with_missing_value(a, b, "id", "id", "name", "name")
    got = {(r["l_id"], r["r_id"]) for r in out.collect()}
    l_null = set(A_PDF[A_PDF["name"].isna()]["id"])
    r_null = set(B_PDF[B_PDF["name"].isna()]["id"])
    expected = {(l, r) for l in l_null for r in B_PDF["id"]} | {
        (l, r) for l in A_PDF["id"] if l not in l_null for r in r_null
    }
    assert got == expected


def test_profiler_reference_headers(spark, tables):
    a, _ = tables
    rep = profile_table_for_join(a, ["id", "name"], reference_headers=True)
    assert rep.columns == ["Attribute", "Unique values", "Missing values", "Comments"]
    rows = {r["Attribute"]: r.asDict() for r in rep.collect()}
    assert "key attribute" in rows["id"]["Comments"]
    assert rows["name"]["Missing values"] == int(A_PDF["name"].isna().sum())
