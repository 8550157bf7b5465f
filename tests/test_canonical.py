"""cluster_representatives / golden_records: hand-computed expected
values on crafted graphs (ties, singletons, foreign edges, nulls)."""

from __future__ import annotations

import pytest

from sparksimjoin.canonical import cluster_representatives, golden_records, member_support


@pytest.fixture(scope="module")
def crafted(spark):
    # component A = {a1, a2, a3}: a2 is the hub (support 1.7)
    # component B = {b1, b2}: equal support 0.5 -> tie -> least id b1
    # component C = {c1}: singleton
    comps = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("a3", "A"),
         ("b1", "B"), ("b2", "B"), ("c1", "C")],
        "id string, component string",
    )
    edges = spark.createDataFrame(
        [("a1", "a2", 0.9), ("a2", "a3", 0.8),
         ("b1", "b2", 0.5),
         # foreign edge across components: must be ignored
         ("a3", "b1", 0.99)],
        "l_id string, r_id string, _sim_score double",
    )
    return comps, edges


def test_member_support(crafted):
    comps, edges = crafted
    got = {(r["component"], r["id"]): r["support"]
           for r in member_support(comps, edges).collect()}
    assert got == {
        ("A", "a1"): 0.9, ("A", "a2"): pytest.approx(1.7), ("A", "a3"): 0.8,
        ("B", "b1"): 0.5, ("B", "b2"): 0.5, ("C", "c1"): 0.0,
    }


def test_cluster_representatives(crafted):
    comps, edges = crafted
    got = {r["component"]: (r["rep_id"], r["n_records"], r["rep_support"])
           for r in cluster_representatives(comps, edges).collect()}
    assert got == {
        "A": ("a2", 3, pytest.approx(1.7)),
        "B": ("b1", 2, 0.5),   # support tie -> least id
        "C": ("c1", 1, 0.0),   # singleton: itself, zero support
    }


def test_representative_is_member(crafted):
    comps, edges = crafted
    reps = cluster_representatives(comps, edges)
    bad = reps.join(
        comps.withColumnRenamed("id", "rep_id"), ["component", "rep_id"], "left_anti"
    )
    assert bad.count() == 0


def test_golden_records(spark):
    comps = spark.createDataFrame(
        [("r1", "X"), ("r2", "X"), ("r3", "X"), ("r4", "Y"), ("r5", "Y")],
        "id string, component string",
    )
    recs = spark.createDataFrame(
        [("r1", "en", None), ("r2", "en", 10), ("r3", "de", 10),
         # Y: lang tie en/de -> least value 'de'; val all-null -> null
         ("r4", "en", None), ("r5", "de", None)],
        "id string, lang string, val int",
    )
    got = {r["component"]: (r["n_records"], r["lang"], r["val"])
           for r in golden_records(comps, recs, "id", ["lang", "val"]).collect()}
    assert got == {"X": (3, "en", 10), "Y": (2, "de", None)}


def test_golden_records_respects_types(spark):
    comps = spark.createDataFrame([("r1", "X")], "id string, component string")
    recs = spark.createDataFrame([("r1", 3.5)], "id string, score double")
    out = golden_records(comps, recs, "id", ["score"])
    assert dict(out.dtypes)["score"] == "double"
    assert out.collect()[0]["score"] == 3.5
