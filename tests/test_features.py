"""featurize_pairs / match_by_rules: every feature vs an independent
Python twin on an all-pairs candset (brute force — the reference test
strategy), null propagation, subset selection, rule-match semantics."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparksimjoin import (
    DEFAULT_FEATURES,
    QgramTokenizer,
    WhitespaceTokenizer,
    featurize_pairs,
    match_by_rules,
)
from sparksimjoin.filter_math import sim_py
from sparksimjoin.fixtures import make_person_tables
from sparksimjoin.naive import levenshtein
from sparksimjoin.simfunctions import jaro_sim, jaro_winkler_sim

A_PDF, B_PDF = make_person_tables(40, 50, seed=11)
WS = WhitespaceTokenizer(return_set=True)
QG3 = QgramTokenizer(qval=3, padding=True, return_set=True)


def py_features(ls: str | None, rs: str | None) -> dict:
    if ls is None or rs is None or (isinstance(ls, float) and math.isnan(ls)) or (
        isinstance(rs, float) and math.isnan(rs)
    ):
        return {f: None for f in DEFAULT_FEATURES}
    lw, rw = WS.tokenize(ls), WS.tokenize(rs)
    lq, rq = QG3.tokenize(ls), QG3.tokenize(rs)
    mx = max(len(ls), len(rs))
    lev = levenshtein(ls, rs)
    return {
        "exact_match": int(ls == rs),
        "len_l": len(ls),
        "len_r": len(rs),
        "len_diff": abs(len(ls) - len(rs)),
        "rel_len_diff": 0.0 if mx == 0 else abs(len(ls) - len(rs)) / mx,
        "n_tok_l": len(lw),
        "n_tok_r": len(rw),
        "overlap_ws": sim_py(lw, rw, "OVERLAP"),
        "jaccard_ws": sim_py(lw, rw, "JACCARD"),
        "dice_ws": sim_py(lw, rw, "DICE"),
        "cosine_ws": sim_py(lw, rw, "COSINE"),
        "overlap_coeff_ws": sim_py(lw, rw, "OVERLAP_COEFFICIENT"),
        "jaccard_qg3": sim_py(lq, rq, "JACCARD"),
        "lev_dist": lev,
        "lev_sim": 1.0 if mx == 0 else 1.0 - lev / mx,
        "jaro": jaro_sim(ls, rs),
        "jaro_winkler": jaro_winkler_sim(ls, rs),
    }


@pytest.fixture(scope="module")
def featurized(spark):
    a = spark.createDataFrame(A_PDF)
    b = spark.createDataFrame(B_PDF)
    cand = spark.createDataFrame(
        pd.DataFrame(
            [(la, rb) for la in A_PDF["id"] for rb in B_PDF["id"]],
            columns=["l_id", "r_id"],
        )
    )
    out = featurize_pairs(cand, "l_id", "r_id", a, b, "id", "id", "name", "name")
    return {(r["l_id"], r["r_id"]): r.asDict() for r in out.collect()}


def test_featurize_all_pairs_parity(spark, featurized):
    names_a = dict(zip(A_PDF["id"], A_PDF["name"]))
    names_b = dict(zip(B_PDF["id"], B_PDF["name"]))
    assert set(featurized) == {(la, rb) for la in names_a for rb in names_b}
    n_null = 0
    for (la, rb), got in featurized.items():
        exp = py_features(names_a[la], names_b[rb])
        for f in DEFAULT_FEATURES:
            g, e = got[f], exp[f]
            if e is None:
                assert g is None, (la, rb, f, g)
                n_null += 1
            elif isinstance(e, float):
                assert g is not None and math.isclose(g, e, rel_tol=0, abs_tol=1e-9), (
                    la, rb, f, g, e,
                )
            else:
                assert g == e, (la, rb, f, g, e)
    # the fixture must actually exercise the null path
    assert n_null > 0


def test_featurize_subset_and_unknown(spark):
    a = spark.createDataFrame(A_PDF)
    cand = spark.createDataFrame(pd.DataFrame({"l_id": [A_PDF["id"][0]],
                                               "r_id": [A_PDF["id"][1]]}))
    out = featurize_pairs(cand, "l_id", "r_id", a, a, "id", "id", "name", "name",
                          features=["jaccard_ws", "lev_dist"])
    assert out.columns == ["l_id", "r_id", "jaccard_ws", "lev_dist"]
    with pytest.raises(AssertionError, match="unknown features"):
        featurize_pairs(cand, "l_id", "r_id", a, a, "id", "id", "name", "name",
                        features=["nope"])


def test_match_by_rules(spark, featurized):
    pdf = pd.DataFrame(
        [dict(l_id=k[0], r_id=k[1], **{f: v[f] for f in DEFAULT_FEATURES})
         for k, v in featurized.items()]
    )
    df = spark.createDataFrame(pdf)
    rules = [
        "jaccard_ws >= 0.5 AND lev_dist <= 10",
        "jaro_winkler >= 0.90",
    ]
    got = {(r["l_id"], r["r_id"]): r["matched_rule"]
           for r in match_by_rules(df, rules).collect()}

    exp = {}
    for _, row in pdf.iterrows():
        r1 = (row["jaccard_ws"] is not None and not pd.isna(row["jaccard_ws"])
              and row["jaccard_ws"] >= 0.5 and row["lev_dist"] <= 10)
        r2 = (row["jaro_winkler"] is not None and not pd.isna(row["jaro_winkler"])
              and row["jaro_winkler"] >= 0.90)
        if r1:
            exp[(row["l_id"], row["r_id"])] = 1
        elif r2:
            exp[(row["l_id"], row["r_id"])] = 2
    assert got == exp
    assert 1 in set(exp.values()) and 2 in set(exp.values()), "rules must both fire"
    with pytest.raises(AssertionError, match="at least one rule"):
        match_by_rules(df, [])


# ---- attr_equivalence_block / union_candsets -------------------------


def brute_attr_block(pdf_a, pdf_b, attrs, self_join, cap=None):
    import collections
    blocks_a = collections.defaultdict(list)
    blocks_b = collections.defaultdict(list)
    for _, row in pdf_a.iterrows():
        k = tuple(row[a] for a in attrs)
        if any(v is None or (isinstance(v, float) and math.isnan(v)) for v in k):
            continue
        blocks_a[k].append(row["id"])
    for _, row in pdf_b.iterrows():
        k = tuple(row[a] for a in attrs)
        if any(v is None or (isinstance(v, float) and math.isnan(v)) for v in k):
            continue
        blocks_b[k].append(row["id"])
    out = set()
    for k, la in blocks_a.items():
        rb = blocks_b.get(k, [])
        if cap is not None and (len(la) > cap or (not self_join and len(rb) > cap)):
            continue
        for x in la:
            for y in (la if self_join else rb):
                if self_join and not (x < y):
                    continue
                out.add((x, y))
    return out


@pytest.fixture(scope="module")
def blocked_tables():
    a = A_PDF.copy()
    b = B_PDF.copy()
    # blocking attrs with a hot value + nulls
    a["city"] = ["metro" if i % 3 == 0 else f"town{i % 7}" for i in range(len(a))]
    b["city"] = ["metro" if i % 4 == 0 else f"town{i % 7}" for i in range(len(b))]
    a.loc[a.index[:3], "city"] = None
    b.loc[b.index[:2], "city"] = None
    a["zip"] = [i % 5 for i in range(len(a))]
    b["zip"] = [i % 5 for i in range(len(b))]
    return a, b


def test_attr_block_two_tables_parity(spark, blocked_tables):
    from sparksimjoin import attr_equivalence_block

    a, b = blocked_tables
    out = attr_equivalence_block(spark.createDataFrame(a), spark.createDataFrame(b),
                                 "id", "id", ["city", "zip"])
    got = {(r["l_id"], r["r_id"]) for r in out.collect()}
    assert got == brute_attr_block(a, b, ["city", "zip"], self_join=False)
    assert out.columns == ["l_id", "r_id"]


def test_attr_block_self_join_and_purge(spark, blocked_tables):
    from sparksimjoin import attr_equivalence_block

    a, _ = blocked_tables
    df = spark.createDataFrame(a)
    out = attr_equivalence_block(df, df, "id", "id", "city", self_join=True)
    exp = brute_attr_block(a, a, ["city"], self_join=True)
    assert {(r["l_id"], r["r_id"]) for r in out.collect()} == exp

    # purging drops the hot 'metro' block entirely, surfaced in metrics
    metrics = {}
    capped = attr_equivalence_block(df, df, "id", "id", "city", self_join=True,
                                    max_block_size=6, metrics_out=metrics)
    exp_capped = brute_attr_block(a, a, ["city"], self_join=True, cap=6)
    assert {(r["l_id"], r["r_id"]) for r in capped.collect()} == exp_capped
    assert exp_capped < exp, "cap must actually purge something in this fixture"
    assert int(metrics["purged_blocks"]) >= 1


def test_union_candsets(spark, blocked_tables):
    from sparksimjoin import attr_equivalence_block, union_candsets

    a, b = blocked_tables
    da, db = spark.createDataFrame(a), spark.createDataFrame(b)
    c1 = attr_equivalence_block(da, db, "id", "id", "city")
    c2 = attr_equivalence_block(da, db, "id", "id", "zip")
    u = union_candsets(c1, c2)
    e1 = brute_attr_block(a, b, ["city"], self_join=False)
    e2 = brute_attr_block(a, b, ["zip"], self_join=False)
    assert {(r["l_id"], r["r_id"]) for r in u.collect()} == e1 | e2
    # extra columns are dropped to the common set
    c3 = c1.withColumn("sim_score", F.lit(1.0))
    u2 = union_candsets(c3, c2)
    assert set(u2.columns) == {"l_id", "r_id"}


def test_numeric_features(spark):
    from sparksimjoin import featurize_numeric_pairs

    rows = [(1, 10, 2.5), (2, 10, 0.0), (3, None, 0.0), (4, 40, -2.5)]
    df = spark.createDataFrame(rows, "id bigint, qty int, price double")
    cand = df.alias("a").crossJoin(df.alias("b")).selectExpr(
        "a.id AS l_id", "b.id AS r_id").where("l_id < r_id")
    out = featurize_numeric_pairs(cand, "l_id", "r_id", df, df, "id", "id",
                                  ["qty", "price"])
    got = {(r.l_id, r.r_id): r.asDict() for r in out.collect()}
    # exact + adiff + rdiff
    assert got[(1, 2)]["qty_exact"] == 1 and got[(1, 2)]["qty_adiff"] == 0.0
    assert got[(1, 2)]["qty_rdiff"] == 0.0
    assert got[(1, 4)]["qty_adiff"] == 30.0
    assert got[(1, 4)]["qty_rdiff"] == pytest.approx(30 / 40)
    # null propagates
    assert got[(1, 3)]["qty_exact"] is None
    assert got[(1, 3)]["qty_rdiff"] is None
    # both zero -> rdiff 0.0, not NaN
    assert got[(2, 3)]["price_exact"] == 1
    assert got[(2, 3)]["price_rdiff"] == 0.0
    # signed values: |2.5 - (-2.5)| / max(2.5, 2.5)
    assert got[(1, 4)]["price_adiff"] == 5.0
    assert got[(1, 4)]["price_rdiff"] == 2.0
