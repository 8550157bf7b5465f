"""monge_elkan_join / generalized_jaccard_join: brute-force parity
(the token-level inner-measure bounds are lossless), self-join
orientation, empty handling, threshold floors."""

from __future__ import annotations

import random

import pytest

from sparksimjoin import (WhitespaceTokenizer, generalized_jaccard_join,
                          monge_elkan_join)
from sparksimjoin.simfunctions import generalized_jaccard_sim, monge_elkan_sim

WS = WhitespaceTokenizer()


def _brute(l_rows, r_rows, t, self_join=False):
    out = {}
    for li, ls in l_rows:
        for ri, rs in r_rows:
            if self_join and not (li < ri):
                continue
            lt = sorted(set(ls.split()))
            rt = sorted(set(rs.split()))
            s = monge_elkan_sim(lt, rt)
            if s >= t:
                out[(li, ri)] = s
    return out


def _corpus(seed, n):
    """Names with typo'd shared tokens so near-identical (not only
    identical) token pairs drive candidates."""
    rng = random.Random(seed)
    words = ["johnson", "jonhson", "johnsen", "smith", "smyth", "walker",
             "walkar", "industries", "industreis", "ltd"]
    rows = []
    for i in range(n):
        k = rng.randrange(1, 4)
        rows.append((i, " ".join(rng.choice(words) for _ in range(k))))
    return rows


def test_self_join_brute_force_parity(spark):
    rows = _corpus(3, 40)
    df = spark.createDataFrame(rows, ["id", "name"])
    for t in (0.9, 0.95):
        out = monge_elkan_join(df, df, "id", "id", "name", "name", WS, t,
                               self_join=True)
        got = {(r.l_id, r.r_id): r._sim_score for r in out.collect()}
        exp = _brute(rows, rows, t, self_join=True)
        assert got.keys() == exp.keys()
        for k in exp:
            assert got[k] == pytest.approx(exp[k], abs=1e-12), k


def test_two_table_brute_force_parity(spark):
    l_rows = _corpus(5, 25)
    r_rows = [(100 + i, s) for i, s in _corpus(7, 25)]
    ldf = spark.createDataFrame(l_rows, ["id", "name"])
    rdf = spark.createDataFrame(r_rows, ["id", "name"])
    out = monge_elkan_join(ldf, rdf, "id", "id", "name", "name", WS, 0.85)
    got = {(r.l_id, r.r_id): r._sim_score for r in out.collect()}
    exp = _brute(l_rows, r_rows, 0.85)
    assert got.keys() == exp.keys()
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12), k


def test_asymmetry_is_left_to_right(spark):
    # ME({a}, {a, b}) = 1.0 but ME({a, b}, {a}) < 1: the join scores
    # left -> right (canonical lesser-key-left on self-joins)
    rows = [(1, "johnson"), (2, "johnson walker")]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = monge_elkan_join(df, df, "id", "id", "name", "name", WS, 0.9,
                           self_join=True).collect()
    assert len(out) == 1 and out[0].l_id == 1 and out[0]._sim_score == 1.0
    # two-table, reversed orientation: mean over BOTH left tokens
    ldf = spark.createDataFrame([rows[1]], ["id", "name"])
    rdf = spark.createDataFrame([rows[0]], ["id", "name"])
    rev = monge_elkan_join(ldf, rdf, "id", "id", "name", "name", WS, 0.9)
    exp = monge_elkan_sim(["johnson", "walker"], ["johnson"])
    assert exp < 0.9 and rev.count() == 0


def test_allow_empty(spark):
    rows = [(1, ""), (2, ""), (3, "smith")]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = monge_elkan_join(df, df, "id", "id", "name", "name", WS, 0.9,
                           self_join=True, allow_empty=True).collect()
    assert {(r.l_id, r.r_id, r._sim_score) for r in out} == {(1, 2, 1.0)}
    assert monge_elkan_join(df, df, "id", "id", "name", "name", WS, 0.9,
                            self_join=True).count() == 0


def test_plan_has_no_cartesian(spark):
    """Every stage — the vocabulary JW join, the token->record
    expansion joins, and the matcher's prep joins — must be an
    equi-join; a cartesian/BNL node means the blocking fell off."""
    rows = _corpus(11, 60)
    df = spark.createDataFrame(rows, ["id", "name"])
    out = monge_elkan_join(df, df, "id", "id", "name", "name", WS, 0.9,
                           self_join=True)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_threshold_floor_raises(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    with pytest.raises(ValueError, match="threshold > 0.8"):
        monge_elkan_join(df, df, "id", "id", "name", "name", WS, 0.7,
                         self_join=True)
    with pytest.raises(ValueError, match="threshold > 2/3"):
        generalized_jaccard_join(df, df, "id", "id", "name", "name", WS, 0.6,
                                 self_join=True)


def _brute_gj(l_rows, r_rows, t, sim_threshold=0.5, self_join=False):
    out = {}
    for li, ls in l_rows:
        for ri, rs in r_rows:
            if self_join and not (li < ri):
                continue
            s = generalized_jaccard_sim(ls.split(), rs.split(),
                                        sim_threshold=sim_threshold)
            if s >= t:
                out[(li, ri)] = s
    return out


def test_gj_join_brute_force_parity(spark):
    rows = _corpus(17, 40)
    df = spark.createDataFrame(rows, ["id", "name"])
    for t in (0.7, 0.85):
        out = generalized_jaccard_join(df, df, "id", "id", "name", "name",
                                       WS, t, self_join=True)
        got = {(r.l_id, r.r_id): r._sim_score for r in out.collect()}
        exp = _brute_gj(rows, rows, t, self_join=True)
        assert got.keys() == exp.keys(), t
        for k in exp:
            assert got[k] == pytest.approx(exp[k], abs=1e-12), (t, k)


def test_gj_join_sim_threshold_one_is_set_jaccard(spark):
    rows = _corpus(19, 30)
    df = spark.createDataFrame(rows, ["id", "name"])
    out = generalized_jaccard_join(df, df, "id", "id", "name", "name",
                                   WS, 0.7, sim_threshold=1.0, self_join=True)
    for r in out.collect():
        sa = set(dict(rows)[r.l_id].split())
        sb = set(dict(rows)[r.r_id].split())
        assert r._sim_score == pytest.approx(len(sa & sb) / len(sa | sb))
    got = {(r.l_id, r.r_id) for r in out.collect()}
    exp = {k for k, _ in _brute_gj(rows, rows, 0.7, sim_threshold=1.0,
                                   self_join=True).items()}
    assert got == exp


def test_unicode_brute_force_parity(spark):
    """Non-ASCII tokens through the whole funnel: char-multiset
    blocking, JW kernels, ME verify (kernels are code-point exact —
    tests/test_jaro.py; this checks the JOIN plumbing)."""
    rows = [(1, "müller gmbh"), (2, "muller gmbh"), (3, "mūller gmbh"),
            (4, "日本語 テスト"), (5, "日本語 テスト"), (6, "éclair"),
            (7, "eclair"), (8, "müller")]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = monge_elkan_join(df, df, "id", "id", "name", "name", WS, 0.85,
                           self_join=True)
    got = {(r.l_id, r.r_id): r._sim_score for r in out.collect()}
    exp = _brute(rows, rows, 0.85, self_join=True)
    assert got.keys() == exp.keys()
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12), k
