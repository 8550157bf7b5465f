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


# ---- term-frequency adjustments + fixed-parameter scoring ------------

from sparksimjoin.fellegi_sunter import (  # noqa: E402
    TfAdjustment,
    score_with_params,
    term_frequencies,
)

_PARAMS = {
    "lambda": 0.05,
    "m": {"name": [0.02, 0.08, 0.9], "typ": [0.1, 0.9],
          "price": [0.05, 0.15, 0.8]},
    "u": {"name": [0.9, 0.08, 0.02], "typ": [0.6, 0.4],
          "price": [0.9, 0.08, 0.02]},
}


def test_term_frequencies_exact(spark):
    l, _, _ = _tables(spark)
    tf = {r.value: r.tf for r in term_frequencies(l, "typ").collect()}
    # ROWS typ values: A,A,B,None,A,A,A,A -> 7 non-null, A x6, B x1
    assert tf == {"A": 6 / 7, "B": 1 / 7}


def _scored_by_pair(df):
    return {(r.l_id, r.r_id): r for r in df.collect()}


def _tf_tables(spark):
    """_tables plus a second 'B' row so both a rare-value (B) and a
    common-value (A) exact typ agreement exist among the pairs."""
    rows = ROWS + [(9, "acme thing", "B", 20.0)]
    l = spark.createDataFrame(rows, "id bigint, name string, typ string,"
                              " price double")
    pairs = spark.createDataFrame(
        [(a, b) for a, _, _, _ in rows for b, _, _, _ in rows if a < b],
        "l_id bigint, r_id bigint")
    comps = [
        levenshtein_comparison("l_name", "r_name", k=2, name="name"),
        exact_comparison("l_typ", "r_typ", name="typ"),
        numeric_comparison("l_price", "r_price", rel_tol=0.05, name="price"),
    ]
    # 8 non-null typ: A x6, B x2
    return l, pairs, comps, {"A": 6 / 8, "B": 2 / 8}


def test_tf_adjustment_hand_values(spark):
    """Adjusted weight == base + log2(u_top/tf(v)) exactly where the
    typ comparison sits at its top level; everything else untouched.
    Rare-value agreement (B, tf=1/7) gains weight; common-value
    agreement (A, tf=6/7 > u_top=0.4) LOSES weight — the adjustment
    is signed, as it must be."""
    l, pairs, comps, tf = _tf_tables(spark)
    vec = comparison_vectors(pairs, l, l, "id", "id", comps,
                             keep_cols=["l_typ"])
    tft = term_frequencies(l, "typ")
    base = _scored_by_pair(score_with_params(vec, comps, _PARAMS))
    adj = _scored_by_pair(score_with_params(
        vec, comps, _PARAMS,
        tf_adjust=[TfAdjustment("typ", "l_typ")], tf_tables={"typ": tft}))
    assert base.keys() == adj.keys()
    u_top = _PARAMS["u"]["typ"][1]
    saw_gain = saw_loss = False
    for key, b in base.items():
        a = adj[key]
        assert (a.gamma_name, a.gamma_typ, a.gamma_price) == (
            b.gamma_name, b.gamma_typ, b.gamma_price)
        if b.gamma_typ == 1:
            v = a.l_typ
            want_w = b.match_weight + math.log2(u_top / tf[v])
            want_tfw = math.log2(u_top / tf[v])
            # recover pm/pu from the base probability and lambda-free
            # identity: prob = pm/(pm+pu) -> pu/pm = 1/prob - 1
            ratio = (1.0 / b.match_probability - 1.0) * (tf[v] / u_top)
            want_p = 1.0 / (1.0 + ratio)
            assert a.match_weight == pytest.approx(want_w, abs=1e-12)
            assert a.tf_weight_typ == pytest.approx(want_tfw, abs=1e-12)
            assert a.match_probability == pytest.approx(want_p, rel=1e-9)
            if v == "B":
                assert a.match_weight > b.match_weight
                saw_gain = True
            else:
                assert a.match_weight < b.match_weight
                saw_loss = True
        else:
            assert a.match_weight == b.match_weight
            assert a.match_probability == b.match_probability
            assert a.tf_weight_typ == 0.0
    assert saw_gain and saw_loss


def test_score_with_params_roundtrip_bit_exact(spark):
    """fellegi_sunter's fitted output == score_with_params(params) on
    the same vectors, BIT-exactly: both paths compute the per-pattern
    doubles in the same driver-Python routine."""
    l, pairs, comps = _tables(spark)
    vec = comparison_vectors(pairs, l, l, "id", "id", comps)
    fitted, params = fellegi_sunter(vec, comps, max_iter=10)
    rescored = score_with_params(vec, comps, params)
    a = _scored_by_pair(fitted)
    b = _scored_by_pair(rescored)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k].match_weight == b[k].match_weight
        assert a[k].match_probability == b[k].match_probability


def test_score_unseen_pattern(spark):
    """score_with_params enumerates the FULL level product, so a
    pattern never seen at fit time still scores (fellegi_sunter's
    observed-pattern table would drop it on the inner join)."""
    comps = [Comparison("a", F.lit(0), 2), Comparison("b", F.lit(0), 2)]
    vec = spark.createDataFrame(
        [(1, 2, 1, 1), (3, 4, 0, 0), (5, 6, 1, 0), (7, 8, 0, 1)],
        "l_id bigint, r_id bigint, gamma_a int, gamma_b int")
    out = score_with_params(vec, comps, {
        "lambda": 0.1, "m": {"a": [0.1, 0.9], "b": [0.2, 0.8]},
        "u": {"a": [0.8, 0.2], "b": [0.7, 0.3]}})
    rows = _scored_by_pair(out)
    assert len(rows) == 4
    w11 = math.log2(0.9 / 0.2) + math.log2(0.8 / 0.3)
    assert rows[(1, 2)].match_weight == pytest.approx(w11, abs=1e-12)
    assert all(r.match_weight is not None for r in rows.values())


def test_tf_missing_value_falls_back(spark):
    """A top-level agreed value ABSENT from the tf corpus (two-table
    linkage where only one side fed the tf table) scores unadjusted
    with tf_weight 0 — never a null weight."""
    l, pairs, comps = _tables(spark)
    vec = comparison_vectors(pairs, l, l, "id", "id", comps,
                             keep_cols=["l_typ"])
    only_a = l.where(F.col("typ") == "A")
    adj = _scored_by_pair(score_with_params(
        vec, comps, _PARAMS,
        tf_adjust=[TfAdjustment("typ", "l_typ")],
        tf_tables={"typ": term_frequencies(only_a, "typ")}))
    base = _scored_by_pair(score_with_params(vec, comps, _PARAMS))
    for key, a in adj.items():
        if a.gamma_typ == 1 and a.l_typ == "B":
            assert a.match_weight == base[key].match_weight
            assert a.tf_weight_typ == 0.0
        assert a.match_weight is not None


def test_tf_weight_multiplier(spark):
    """weight=0.5 halves the log-weight delta and square-roots the
    pu factor."""
    l, pairs, comps, tf = _tf_tables(spark)
    vec = comparison_vectors(pairs, l, l, "id", "id", comps,
                             keep_cols=["l_typ"])
    tft = term_frequencies(l, "typ")
    base = _scored_by_pair(score_with_params(vec, comps, _PARAMS))
    half = _scored_by_pair(score_with_params(
        vec, comps, _PARAMS,
        tf_adjust=[TfAdjustment("typ", "l_typ", weight=0.5)],
        tf_tables={"typ": tft}))
    u_top = _PARAMS["u"]["typ"][1]
    for key, h in half.items():
        b = base[key]
        if h.gamma_typ == 1:
            want = b.match_weight + 0.5 * math.log2(u_top / tf[h.l_typ])
            assert h.match_weight == pytest.approx(want, abs=1e-12)
        else:
            assert h.match_weight == b.match_weight


def test_tf_determinism_across_partitioning(spark):
    l, pairs, comps = _tables(spark)
    tft = term_frequencies(l, "typ")

    def run(np_):
        vec = comparison_vectors(
            pairs.repartition(np_), l.repartition(np_), l, "id", "id",
            comps, keep_cols=["l_typ"])
        out = score_with_params(
            vec, comps, _PARAMS,
            tf_adjust=[TfAdjustment("typ", "l_typ")], tf_tables={"typ": tft})
        return sorted(
            (r.l_id, r.r_id, r.match_weight, r.match_probability,
             r.tf_weight_typ) for r in out.collect())

    assert run(1) == run(7)


def test_tf_validation_errors(spark):
    l, pairs, comps = _tables(spark)
    vec = comparison_vectors(pairs, l, l, "id", "id", comps,
                             keep_cols=["l_typ"])
    tft = term_frequencies(l, "typ")
    with pytest.raises(ValueError, match="unknown comparison"):
        score_with_params(vec, comps, _PARAMS,
                          tf_adjust=[TfAdjustment("nope", "l_typ")],
                          tf_tables={"nope": tft})
    with pytest.raises(ValueError, match="duplicate tf adjustment"):
        score_with_params(vec, comps, _PARAMS,
                          tf_adjust=[TfAdjustment("typ", "l_typ"),
                                     TfAdjustment("typ", "l_typ")],
                          tf_tables={"typ": tft})
    with pytest.raises(ValueError, match="not in vectors"):
        score_with_params(vec, comps, _PARAMS,
                          tf_adjust=[TfAdjustment("typ", "l_missing")],
                          tf_tables={"typ": tft})
    with pytest.raises(ValueError, match="no tf table"):
        score_with_params(vec, comps, _PARAMS,
                          tf_adjust=[TfAdjustment("typ", "l_typ")])
    with pytest.raises(ValueError, match="weight must be > 0"):
        score_with_params(vec, comps, _PARAMS,
                          tf_adjust=[TfAdjustment("typ", "l_typ", weight=0)],
                          tf_tables={"typ": tft})
    with pytest.raises(ValueError, match="lambda"):
        score_with_params(vec, comps, {**_PARAMS, "lambda": 1.0})
    with pytest.raises(ValueError, match="missing comparison"):
        bad = {**_PARAMS, "m": {k: v for k, v in _PARAMS["m"].items()
                                if k != "typ"}}
        score_with_params(vec, comps, bad)
    with pytest.raises(ValueError, match="levels"):
        bad = {**_PARAMS, "m": {**_PARAMS["m"], "typ": [0.1, 0.8, 0.1]}}
        score_with_params(vec, comps, bad)
    with pytest.raises(ValueError, match="keep_cols"):
        comparison_vectors(pairs, l, l, "id", "id", comps,
                           keep_cols=["typ"])  # unprefixed name


def test_keep_cols_carried(spark):
    l, pairs, comps = _tables(spark)
    vec = comparison_vectors(pairs, l, l, "id", "id", comps,
                             keep_cols=["l_typ", "r_typ"])
    assert {"l_typ", "r_typ"}.issubset(set(vec.columns))


# ---- u estimation from random pairs + parameter persistence ----------

from sparksimjoin.fellegi_sunter import (  # noqa: E402
    estimate_u,
    load_fs_params,
    sampled_pairs,
    save_fs_params,
)


def _u_corpus(spark):
    """200 records, typ uniform over {A,B}, so a random pair agrees on
    typ with probability ~0.5 — an analytic target for u."""
    rows = [(i, f"name_{i}", "A" if i % 2 else "B", float(i)) for i in range(200)]
    return spark.createDataFrame(
        rows, "id bigint, name string, typ string, price double")


def test_sampled_pairs_deterministic_and_sized(spark):
    df = _u_corpus(spark)
    p1 = {(r.l_id, r.r_id) for r in sampled_pairs(df, "id", 500, seed=7).collect()}
    p2 = {(r.l_id, r.r_id)
          for r in sampled_pairs(df.repartition(13), "id", 500, seed=7).collect()}
    assert p1 == p2
    assert all(a < b for a, b in p1)
    # expected yield ~ target; hash bucketing is Poisson-ish, allow 3x
    assert 150 <= len(p1) <= 1500
    p3 = {(r.l_id, r.r_id) for r in sampled_pairs(df, "id", 500, seed=8).collect()}
    assert p1 != p3  # seed moves the sample


def test_estimate_u_recovers_level_frequencies(spark):
    df = _u_corpus(spark)
    comps = [exact_comparison("l_typ", "r_typ", name="typ")]
    u, n_pairs = estimate_u(df, "id", comps, target_pairs=5000, seed=3)
    assert n_pairs > 1000
    # typ agreement probability on random pairs ~ 0.5 (100 A, 100 B)
    assert abs(u["typ"][1] - 0.5) < 0.05
    assert abs(sum(u["typ"]) - 1.0) < 1e-12
    assert all(0 < p < 1 for p in u["typ"])


def test_estimate_u_feeds_score_with_params(spark):
    l, pairs, comps = _tables(spark)[0], None, None
    df = _u_corpus(spark)
    comps = [
        levenshtein_comparison("l_name", "r_name", k=2, name="name"),
        exact_comparison("l_typ", "r_typ", name="typ"),
    ]
    u, _ = estimate_u(df, "id", comps, target_pairs=2000, seed=5)
    params = {
        "lambda": 0.01,
        "m": {"name": [0.05, 0.15, 0.8], "typ": [0.1, 0.9]},
        "u": u,
    }
    pairs = spark.createDataFrame([(0, 1), (2, 4)], "l_id bigint, r_id bigint")
    vec = comparison_vectors(pairs, df, df, "id", "id", comps)
    out = score_with_params(vec, comps, params)
    assert out.count() == 2
    assert "match_weight" in out.columns


def test_estimate_u_determinism(spark):
    df = _u_corpus(spark)
    comps = [exact_comparison("l_typ", "r_typ", name="typ")]
    u1, n1 = estimate_u(df, "id", comps, target_pairs=3000, seed=11)
    u2, n2 = estimate_u(df.repartition(7), "id", comps, target_pairs=3000,
                        seed=11)
    assert (u1, n1) == (u2, n2)


def test_estimate_u_guards(spark):
    df = _u_corpus(spark)
    comps = [exact_comparison("l_typ", "r_typ", name="typ")]
    with pytest.raises(ValueError, match="target_pairs"):
        estimate_u(df, "id", comps, target_pairs=0)
    with pytest.raises(ValueError, match="smoothing"):
        estimate_u(df, "id", comps, smoothing=-1)
    one = spark.createDataFrame([(1, "x", "A", 1.0)],
                                "id bigint, name string, typ string, price double")
    with pytest.raises(ValueError, match=">= 2 non-null-key records"):
        sampled_pairs(one, "id", 10)


def test_fs_params_save_load_roundtrip(spark, tmp_path):
    l, pairs, comps = _tables(spark)
    vec = comparison_vectors(pairs, l, l, "id", "id", comps)
    scored, params = fellegi_sunter(vec, comps)
    path = str(tmp_path / "fs_params.json")
    save_fs_params(params, path)
    loaded = load_fs_params(path)
    # shortest-round-trip repr: bit-identical doubles
    assert loaded["lambda"] == params["lambda"]
    assert loaded["m"] == params["m"]
    assert loaded["u"] == params["u"]
    # re-scoring from the loaded params reproduces the fitted scores
    rescored = score_with_params(vec, comps, loaded)
    a = {(r.l_id, r.r_id): (r.match_weight, r.match_probability)
         for r in scored.collect()}
    b = {(r.l_id, r.r_id): (r.match_weight, r.match_probability)
         for r in rescored.collect()}
    assert a == b
    with pytest.raises(ValueError, match="missing"):
        bad = str(tmp_path / "bad.json")
        import json
        with open(bad, "w") as f:
            json.dump({"lambda": 0.1}, f)
        load_fs_params(bad)


def test_score_rejects_out_of_range_or_null_gamma(spark):
    """Scoring joins against the ENUMERATED pattern table; before the
    guard, a gamma outside [0, n_levels) or NULL silently dropped the
    pair from the output (inner join, no match). Now raises per row."""
    comps = [Comparison("a", F.lit(0), 2)]
    params = {"lambda": 0.1, "m": {"a": [0.1, 0.9]}, "u": {"a": [0.8, 0.2]}}
    bad = spark.createDataFrame(
        [(1, 2, 5)], "l_id bigint, r_id bigint, gamma_a int")
    with pytest.raises(Exception, match="gamma_a = 5 outside"):
        score_with_params(bad, comps, params).collect()
    nul = spark.createDataFrame(
        [(1, 2, None)], "l_id bigint, r_id bigint, gamma_a int")
    with pytest.raises(Exception, match="gamma_a = NULL outside"):
        score_with_params(nul, comps, params).collect()
    # in-range still scores (guard is pass-through)
    ok = spark.createDataFrame(
        [(1, 2, 1)], "l_id bigint, r_id bigint, gamma_a int")
    assert score_with_params(ok, comps, params).count() == 1


def test_fit_rejects_null_gamma(spark):
    """fellegi_sunter used to die with a bare TypeError on NULL gamma
    deep in the histogram decode; now a ValueError naming the column
    and the .otherwise(0) contract."""
    comps = [Comparison("a", F.lit(0), 2)]
    vec = spark.createDataFrame(
        [(1, 2, 1), (3, 4, None)], "l_id bigint, r_id bigint, gamma_a int")
    with pytest.raises(ValueError, match="gamma_a contains NULL"):
        fellegi_sunter(vec, comps)


def test_tf_weight_column_reconstructs_match_weight(spark):
    """tf_weight_<name> is the APPLIED adjustment term (multiplier
    included): base match_weight + tf_weight == adjusted match_weight
    exactly, also for weight != 1."""
    l, pairs, comps, tf = _tf_tables(spark)
    vec = comparison_vectors(pairs, l, l, "id", "id", comps,
                             keep_cols=["l_typ"])
    tft = term_frequencies(l, "typ")
    base = _scored_by_pair(score_with_params(vec, comps, _PARAMS))
    half = _scored_by_pair(score_with_params(
        vec, comps, _PARAMS,
        tf_adjust=[TfAdjustment("typ", "l_typ", weight=0.5)],
        tf_tables={"typ": tft}))
    assert any(h.tf_weight_typ != 0.0 for h in half.values())
    for key, h in half.items():
        assert h.match_weight == pytest.approx(
            base[key].match_weight + h.tf_weight_typ, abs=1e-12)


def test_sampled_pairs_null_keys_sized(spark):
    """Bucket count must be sized from the NON-NULL-key population:
    with 3/4 of keys null, sizing from the raw row count used to
    yield ~1/16 of target_pairs."""
    rows = [(i if i % 4 == 0 else None, f"r{i}") for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, payload string")
    got = sampled_pairs(df, "id", 200, seed=3).collect()
    # 100 usable records -> C(100,2)=4950 space, buckets sized for
    # ~200 pairs; Poisson-ish spread, assert the right order of
    # magnitude (the pre-fix behavior yielded ~12)
    assert 60 <= len(got) <= 600
    assert all(r.l_id is not None and r.r_id is not None for r in got)


def test_comparison_vectors_rejects_unresolved_pair_keys(spark):
    """Inner joins used to silently DROP pairs whose key was NULL or
    absent from ltable/rtable (biasing the EM fit invisibly); now a
    per-row guard raises with the offending pair."""
    l, pairs, comps = _tables(spark)
    ghost = pairs.limit(1).select(
        F.lit(99999).alias("l_id"), F.col("r_id"))
    with pytest.raises(Exception, match="does not resolve"):
        comparison_vectors(ghost, l, l, "id", "id", comps).collect()
    nulled = pairs.limit(1).select(
        F.lit(None).cast("bigint").alias("l_id"), F.col("r_id"))
    with pytest.raises(Exception, match="does not resolve"):
        comparison_vectors(nulled, l, l, "id", "id", comps).collect()
    # fully-resolvable pairs unchanged
    assert comparison_vectors(pairs, l, l, "id", "id", comps).count() \
        == pairs.count()


def test_pattern_rows_underflow_guard():
    """Both mixture products underflowing to 0.0 must yield
    probability 0.0 (matching _em's convention), not
    ZeroDivisionError."""
    from sparksimjoin.fellegi_sunter import _pattern_rows

    tiny = 5e-324
    rows = _pattern_rows([(0,)], 0.1, [[tiny]], [[tiny]])
    (*_, prob), = rows
    assert prob == 0.0


def test_estimate_u_smoothing_zero_stays_in_open_interval(spark):
    """smoothing=0 with an unseen level used to emit u == 0.0 exactly,
    which score_with_params rejects — breaking the documented drop-in
    contract. The EPS clamp (same guard as the EM path) keeps every
    returned probability in (0, 1)."""
    # every record agrees on typ -> the disagree level is NEVER seen
    df = spark.createDataFrame(
        [(i, f"name{i}", "A") for i in range(60)],
        "id bigint, name string, typ string",
    )
    comps = [exact_comparison("l_typ", "r_typ", name="typ")]
    u, n = estimate_u(df, "id", comps, target_pairs=500, seed=7,
                      smoothing=0.0)
    assert n > 0
    assert all(0.0 < p < 1.0 for p in u["typ"])  # clamped, not 0.0
    # and the drop-in contract really holds: score_with_params accepts
    pairs = spark.createDataFrame([(0, 1)], "l_id bigint, r_id bigint")
    vec = comparison_vectors(pairs, df, df, "id", "id", comps)
    params = {"lambda": 0.01, "m": {"typ": [0.1, 0.9]}, "u": u}
    assert score_with_params(vec, comps, params).count() == 1
