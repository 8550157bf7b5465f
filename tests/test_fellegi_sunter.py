"""Fellegi-Sunter probabilistic linkage (sparksimjoin/fellegi_sunter.py):
comparison-vector parity vs a pure-Python twin, EM behavior on a
separable corpus, bit-determinism across partitionings (the module's
stated contract), match-weight consistency with the returned params,
and validation errors."""

from __future__ import annotations

import math

import pytest

from sparksimjoin.fellegi_sunter import (
    Comparison,
    comparison_vectors,
    exact_comparison,
    fellegi_sunter,
    gamma_histogram,
    levenshtein_comparison,
    numeric_comparison,
    _em,
)

from pyspark.sql import functions as F


def _lev(a, b):
    if a is None or b is None:
        return None
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def _expected_gammas(lrow, rrow, rel_tol=0.05, k=2):
    ln, lt, lp = lrow
    rn, rt, rp = rrow
    if ln is not None and rn is not None and ln == rn:
        g_name = 2
    elif ln is not None and rn is not None and _lev(ln, rn) <= k:
        g_name = 1
    else:
        g_name = 0
    g_type = 1 if (lt is not None and rt is not None and lt == rt) else 0
    if lp is not None and rp is not None and lp == rp:
        g_price = 2
    elif (lp is not None and rp is not None
          and max(abs(lp), abs(rp)) > 0
          and abs(lp - rp) / max(abs(lp), abs(rp)) <= rel_tol):
        g_price = 1
    else:
        g_price = 0
    return g_name, g_type, g_price


ROWS = [
    (1, "acme widget", "A", 10.0),
    (2, "acme widgex", "A", 10.2),      # lev 1, type eq, price close
    (3, "acme widget", "B", 10.0),      # name exact, type diff, price exact
    (4, "zzz", None, 50.0),             # null type
    (5, None, "A", None),               # null name + price
    (6, "totally other", "A", -3.0),
    (7, "acme widget", "A", 0.0),       # both-zero price edge vs id 8
    (8, "acme wi", "A", 0.0),
]


def _tables(spark):
    l = spark.createDataFrame(
        [(i, n, t, p) for i, n, t, p in ROWS],
        "id bigint, name string, typ string, price double")
    pairs = spark.createDataFrame(
        [(a, b) for a, _, _, _ in ROWS for b, _, _, _ in ROWS if a < b],
        "l_id bigint, r_id bigint")
    comps = [
        levenshtein_comparison("l_name", "r_name", k=2, name="name"),
        exact_comparison("l_typ", "r_typ", name="typ"),
        numeric_comparison("l_price", "r_price", rel_tol=0.05, name="price"),
    ]
    return l, pairs, comps


def test_comparison_vectors_bruteforce(spark):
    l, pairs, comps = _tables(spark)
    vec = comparison_vectors(pairs, l, l, "id", "id", comps)
    got = {(r.l_id, r.r_id): (r.gamma_name, r.gamma_typ, r.gamma_price)
           for r in vec.collect()}
    by_id = {i: (n, t, p) for i, n, t, p in ROWS}
    assert len(got) == len(ROWS) * (len(ROWS) - 1) // 2
    for (a, b), g in got.items():
        assert g == _expected_gammas(by_id[a], by_id[b]), (a, b, g)


def test_gamma_histogram_exact(spark):
    l, pairs, comps = _tables(spark)
    vec = comparison_vectors(pairs, l, l, "id", "id", comps)
    hist = {tuple(r[c] for c in ("gamma_name", "gamma_typ", "gamma_price")): r.n
            for r in gamma_histogram(
                vec, ["gamma_name", "gamma_typ", "gamma_price"]).collect()}
    by_id = {i: (n, t, p) for i, n, t, p in ROWS}
    from collections import Counter
    want = Counter(_expected_gammas(by_id[a], by_id[b])
                   for a in by_id for b in by_id if a < b)
    assert hist == dict(want)
    assert sum(hist.values()) == len(ROWS) * (len(ROWS) - 1) // 2


def _separable_corpus(spark, n_match=60, n_noise=300):
    """Matches: near-identical name (lev<=1), same type, close price.
    Noise pairs: independent draws — gammas almost always 0."""
    recs = []
    pairs = []
    types = ["A", "B", "C", "D"]
    for i in range(n_match):
        name = f"record number {i} alpha beta"
        recs.append((2 * i, name, types[i % 4], 100.0 + i))
        recs.append((2 * i + 1, name + ("x" if i % 3 else ""),
                     types[i % 4], (100.0 + i) * (1.01 if i % 2 else 1.0)))
        pairs.append((2 * i, 2 * i + 1))
    base = 2 * n_match
    for j in range(n_noise):
        recs.append((base + 2 * j, f"noise {j} {'q' * (j % 7)} left",
                     types[j % 4], 1000.0 + 17 * j))
        recs.append((base + 2 * j + 1, f"other {j * 31 % 97} thing right",
                     types[(j + 1) % 4], 5000.0 + 13 * j))
        pairs.append((base + 2 * j, base + 2 * j + 1))
    l = spark.createDataFrame(recs, "id bigint, name string, typ string, price double")
    p = spark.createDataFrame(pairs, "l_id bigint, r_id bigint")
    comps = [
        levenshtein_comparison("l_name", "r_name", k=1, name="name"),
        exact_comparison("l_typ", "r_typ", name="typ"),
        numeric_comparison("l_price", "r_price", rel_tol=0.05, name="price"),
    ]
    return l, p, comps, n_match, n_noise


def test_em_separates_matches(spark):
    l, p, comps, n_match, n_noise = _separable_corpus(spark)
    vec = comparison_vectors(p, l, l, "id", "id", comps)
    scored, params = fellegi_sunter(vec, comps)
    rows = scored.collect()
    assert len(rows) == n_match + n_noise
    for r in rows:
        is_match = r.l_id < 2 * n_match
        if is_match:
            assert r.match_probability > 0.9, r
            assert r.match_weight > 0, r
        else:
            assert r.match_probability < 0.1, r
    # lambda should land near the true match fraction
    true_lam = n_match / (n_match + n_noise)
    assert abs(params["lambda"] - true_lam) < 0.05
    # m/u structure: matches agree on name far more than non-matches
    assert params["m"]["name"][2] + params["m"]["name"][1] > 0.9
    assert params["u"]["name"][0] > 0.9


def test_determinism_across_partitioning(spark):
    l, p, comps, _, _ = _separable_corpus(spark, n_match=20, n_noise=80)
    outs = []
    for nparts in (1, 7):
        vec = comparison_vectors(
            p.repartition(nparts), l.repartition(nparts), l, "id", "id", comps)
        scored, params = fellegi_sunter(vec, comps)
        rows = sorted((r.l_id, r.r_id, r.match_weight, r.match_probability)
                      for r in scored.collect())
        outs.append((rows, params))
    (r1, p1), (r2, p2) = outs
    assert r1 == r2                      # bit-identical, not approx
    assert p1 == p2


def test_match_weight_matches_params(spark):
    """scored.match_weight must equal the log2 likelihood ratio
    recomputed from the returned params — same float ops, exact."""
    l, p, comps, _, _ = _separable_corpus(spark, n_match=15, n_noise=50)
    vec = comparison_vectors(p, l, l, "id", "id", comps)
    scored, params = fellegi_sunter(vec, comps)
    names = ["name", "typ", "price"]
    for r in scored.collect():
        w = 0.0
        pm, pu = params["lambda"], 1.0 - params["lambda"]
        for nm in names:
            g = r[f"gamma_{nm}"]
            pm *= params["m"][nm][g]
            pu *= params["u"][nm][g]
            w += math.log2(params["m"][nm][g] / params["u"][nm][g])
        assert r.match_weight == w
        assert r.match_probability == pm / (pm + pu)


def test_em_hand_histogram():
    """One binary comparison, clean mixture: 100 agreeing pairs out of
    1000. The agree pattern must carry positive evidence, disagree
    negative, regardless of where lambda settles."""
    lam, m, u = _em([((0,), 900), ((1,), 100)], [2], max_iter=25,
                    initial_lambda=0.1)
    assert 0 < lam < 1
    w_agree = math.log2(m[0][1] / u[0][1])
    w_disagree = math.log2(m[0][0] / u[0][0])
    assert w_agree > 0 > w_disagree


def test_validation_errors(spark):
    l, pairs, comps = _tables(spark)
    vec = comparison_vectors(pairs, l, l, "id", "id", comps)
    with pytest.raises(ValueError, match="at least one"):
        comparison_vectors(pairs, l, l, "id", "id", [])
    with pytest.raises(ValueError, match="duplicate"):
        comparison_vectors(pairs, l, l, "id", "id",
                           [exact_comparison("l_typ", "r_typ", name="x"),
                            exact_comparison("l_name", "r_name", name="x")])
    with pytest.raises(ValueError, match="pair column"):
        comparison_vectors(pairs.withColumnRenamed("l_id", "zz"),
                           l, l, "id", "id", comps)
    with pytest.raises(ValueError, match="initial_lambda"):
        fellegi_sunter(vec, comps, initial_lambda=1.5)
    with pytest.raises(ValueError, match="max_iter"):
        fellegi_sunter(vec, comps, max_iter=0)
    with pytest.raises(ValueError, match="not in vectors"):
        fellegi_sunter(vec.drop("gamma_price"), comps)
    # gamma level out of declared range -> loud failure, not silence
    bad = vec.withColumn("gamma_typ", F.lit(7))
    with pytest.raises(ValueError, match="out of range"):
        fellegi_sunter(bad, comps)
    with pytest.raises(ValueError, match="no pairs"):
        fellegi_sunter(vec.where(F.lit(False)), comps)


def test_column_collision_guard(spark):
    """An ltable column that would collide with the pair-id columns
    after prefixing must be rejected, not silently renamed."""
    l = spark.createDataFrame([(1, "a", "b")], "k bigint, id string, x string")
    pairs = spark.createDataFrame([(1, 1)], "l_id bigint, r_id bigint")
    comps = [exact_comparison("l_x", "r_x", name="x")]
    # non-key column "id" prefixes to "l_id"/"r_id" == the pair-id cols
    with pytest.raises(ValueError, match="collision"):
        comparison_vectors(pairs, l, l, "k", "k", comps)


def test_custom_comparison_levels(spark):
    """A 4-level custom Comparison flows through end to end."""
    l = spark.createDataFrame(
        [(i, float(i % 4)) for i in range(40)], "id bigint, v double")
    pairs = spark.createDataFrame(
        [(a, a + 1) for a in range(0, 39)], "l_id bigint, r_id bigint")
    comp = Comparison("band", F.least(
        F.abs(F.col("l_v") - F.col("r_v")).cast("int"), F.lit(3)), 4)
    vec = comparison_vectors(pairs, l, l, "id", "id", [comp])
    levels = {r.gamma_band for r in vec.collect()}
    assert levels == {1, 3}  # |i%4 - (i+1)%4| is 1 or 3
    scored, params = fellegi_sunter(vec, [comp])
    assert scored.count() == 39
    assert len(params["m"]["band"]) == 4
