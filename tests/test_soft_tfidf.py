"""soft_tfidf_join: brute-force parity against an independent Python
twin (weights, norms, closest-b terms, exact summation), shared
weight space, orientation, guards, plan shape."""

from __future__ import annotations

import math
import random

import pytest

from sparksimjoin import WhitespaceTokenizer, soft_tfidf_join
from sparksimjoin.joins.soft_tfidf import SOFT_SCALE
from sparksimjoin.simfunctions import jaro_winkler_sim

WS = WhitespaceTokenizer()


def _weights(corpora):
    """w_t = (N * SOFT_SCALE) // df_t over the union corpus of
    distinct-token records."""
    recs = [sorted(set(s.split())) for s in corpora if s is not None and s.split()]
    n = len(recs)
    df = {}
    for toks in recs:
        for t in toks:
            df[t] = df.get(t, 0) + 1
    return {t: (n * SOFT_SCALE) // d for t, d in df.items()}, n


def _soft_tfidf_py(ls, rs, w, theta):
    A, B = sorted(set(ls.split())), sorted(set(rs.split()))
    if not A or not B:
        return None
    n1 = math.sqrt(float(sum(w[a] * w[a] for a in A)))
    n2 = math.sqrt(float(sum(w[b] * w[b] for b in B)))
    terms = []
    for a in A:
        mx, w2 = max((jaro_winkler_sim(a, b), w[b]) for b in B)
        if mx >= theta:
            terms.append(float(w[a] * w2) * mx)
    return math.fsum(terms) / (n1 * n2)


def _corpus(seed, n):
    rng = random.Random(seed)
    words = ["johnson", "jonhson", "johnsen", "smith", "smyth", "walker",
             "walkar", "industries", "industreis", "ltd", "zylker"]
    return [(i, " ".join(rng.choice(words) for _ in range(rng.randrange(1, 4))))
            for i in range(n)]


def _brute(l_rows, r_rows, w, t, theta, self_join=False):
    out = {}
    for li, ls in l_rows:
        for ri, rs in r_rows:
            if self_join and not (li < ri):
                continue
            s = _soft_tfidf_py(ls, rs, w, theta)
            if s is not None and s >= t:
                out[(li, ri)] = s
    return out


def test_self_join_brute_force_parity(spark):
    rows = _corpus(29, 40)
    df = spark.createDataFrame(rows, ["id", "name"])
    w, _ = _weights([s for _, s in rows])
    for t in (0.5, 0.8):
        out = soft_tfidf_join(df, df, "id", "id", "name", "name", WS, t,
                              self_join=True)
        got = {(r.l_id, r.r_id): r._sim_score for r in out.collect()}
        exp = _brute(rows, rows, w, t, 0.9, self_join=True)
        assert got.keys() == exp.keys(), t
        for k in exp:
            assert got[k] == pytest.approx(exp[k], abs=1e-9), (t, k)


def test_two_table_shared_weight_space(spark):
    l_rows = _corpus(31, 20)
    r_rows = [(100 + i, s) for i, s in _corpus(37, 20)]
    ldf = spark.createDataFrame(l_rows, ["id", "name"])
    rdf = spark.createDataFrame(r_rows, ["id", "name"])
    w, n = _weights([s for _, s in l_rows] + [s for _, s in r_rows])
    assert n == 40  # both sides count toward N and df
    out = soft_tfidf_join(ldf, rdf, "id", "id", "name", "name", WS, 0.4,
                          theta=0.85)
    got = {(r.l_id, r.r_id): r._sim_score for r in out.collect()}
    exp = _brute(l_rows, r_rows, w, 0.4, 0.85)
    assert got.keys() == exp.keys()
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-9), k


def test_asymmetry_and_orientation(spark):
    # close-set runs over the LEFT tokens: ({a}, {a,b}) scores
    # differently than ({a,b}, {a}); self-joins score lesser-key-left
    rows = [(1, "zylker"), (2, "zylker ltd")]
    df = spark.createDataFrame(rows, ["id", "name"])
    w, _ = _weights([s for _, s in rows])
    out = soft_tfidf_join(df, df, "id", "id", "name", "name", WS, 0.01,
                          self_join=True).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.l_id, r.r_id) == (1, 2)
    assert r._sim_score == pytest.approx(_soft_tfidf_py("zylker", "zylker ltd", w, 0.9),
                                         abs=1e-12)


def test_guards(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    with pytest.raises(ValueError, match="theta > 0.8"):
        soft_tfidf_join(df, df, "id", "id", "name", "name", WS, 0.5,
                        theta=0.7, self_join=True)
    with pytest.raises(ValueError, match="positive"):
        soft_tfidf_join(df, df, "id", "id", "name", "name", WS, 0.0,
                        self_join=True)


def test_empty_input(spark):
    df = spark.createDataFrame([], "id bigint, name string")
    out = soft_tfidf_join(df, df, "id", "id", "name", "name", WS, 0.5,
                          self_join=True)
    assert out.count() == 0
    assert out.columns == ["l_id", "r_id", "_sim_score"]


def test_plan_has_no_cartesian(spark):
    rows = _corpus(41, 50)
    df = spark.createDataFrame(rows, ["id", "name"])
    out = soft_tfidf_join(df, df, "id", "id", "name", "name", WS, 0.5,
                          self_join=True)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
