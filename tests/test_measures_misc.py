"""Bag distance (pure Column expression) and Generalized Jaccard
(hybrid greedy-matching measure): kernel/expr parity against
independent Python twins + matcher integration."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from sparksimjoin import GeneralizedJaccard, WhitespaceTokenizer, apply_matcher
from sparksimjoin.simfunctions import (bag_distance_expr,
                                       generalized_jaccard_sim, jaro_sim)


def _bag_distance_py(a: str, b: str) -> int:
    ca, cb = Counter(a), Counter(b)
    return max(sum((ca - cb).values()), sum((cb - ca).values()))


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def _rand_strings(n, alphabet="abcx", maxlen=10, seed=23):
    rng = random.Random(seed)
    return ["".join(rng.choice(alphabet) for _ in range(rng.randrange(maxlen + 1)))
            for _ in range(n)]


def test_bag_distance_expr_matches_python_twin(spark):
    ss = _rand_strings(40)
    rows = [(i, ss[i], ss[(i * 7 + 3) % len(ss)]) for i in range(len(ss))]
    df = spark.createDataFrame(rows, ["id", "a", "b"])
    got = {r.id: r.d for r in
           df.select("id", bag_distance_expr(F.col("a"), F.col("b")).alias("d")).collect()}
    for i, a, b in rows:
        assert got[i] == float(_bag_distance_py(a, b)), (a, b)


def test_bag_distance_empty_string_edges(spark):
    """Regression: sequence(1, 0) reverses to [1, 0] in Spark, which
    once fabricated two phantom '' chars for empty strings —
    bag_distance('', 'a') must be 1 (= levenshtein), not 2."""
    rows = [(1, "", "a"), (2, "", ""), (3, "ab", ""), (4, "", "xyz")]
    df = spark.createDataFrame(rows, ["id", "a", "b"])
    got = {r.id: r.d for r in
           df.select("id", bag_distance_expr(F.col("a"), F.col("b")).alias("d")).collect()}
    assert got == {1: 1.0, 2: 0.0, 3: 2.0, 4: 3.0}


def test_bag_distance_lower_bounds_levenshtein():
    ss = _rand_strings(30, seed=9)
    for a in ss[:15]:
        for b in ss[15:]:
            assert _bag_distance_py(a, b) <= _levenshtein(a, b)


def test_generalized_jaccard_threshold_one_is_set_jaccard():
    rng = random.Random(5)
    vocab = ["ring", "rung", "bolt", "nut", "cog", "axle"]
    for _ in range(100):
        A = rng.sample(vocab, rng.randrange(0, 5))
        B = rng.sample(vocab, rng.randrange(0, 5))
        got = generalized_jaccard_sim(A, B, sim_threshold=1.0)
        sa, sb = set(A), set(B)
        if not sa and not sb:
            exp = 1.0
        elif not sa or not sb:
            exp = 0.0
        else:
            exp = len(sa & sb) / len(sa | sb)
        assert got == pytest.approx(exp), (A, B)


def test_generalized_jaccard_hand_value():
    # A={'nite','day'}, B={'night','data'}: jaro(nite,night)~0.9056,
    # jaro(day,data)~0.7833, cross sims below 0.5 -> two matches,
    # score = (s1+s2) / (2+2-2)
    A, B = ["nite", "day"], ["night", "data"]
    s = generalized_jaccard_sim(A, B)
    exp = (jaro_sim("nite", "night") + jaro_sim("day", "data")) / 2.0
    assert s == pytest.approx(exp)
    # greedy matching is one-to-one: duplicates on one side can't all
    # match the single best partner
    s2 = generalized_jaccard_sim(["aa", "ab"], ["aa"])
    assert s2 == pytest.approx(jaro_sim("aa", "aa") / 2.0)


def test_generalized_jaccard_order_invariance():
    A, B = ["kitten", "sitting", "kit"], ["mitten", "sit", "bitten"]
    base = generalized_jaccard_sim(A, B)
    rng = random.Random(1)
    for _ in range(5):
        a2, b2 = A[:], B[:]
        rng.shuffle(a2)
        rng.shuffle(b2)
        assert generalized_jaccard_sim(a2, b2) == base


def test_matcher_bag_and_gj(spark):
    rows = [(1, "small ring"), (2, "small ring"), (3, "red widget"),
            (4, "red widgets"), (5, "blue bolt")]
    df = spark.createDataFrame(rows, ["id", "name"])
    cand = df.alias("a").crossJoin(df.alias("b")).selectExpr(
        "a.id AS l_id", "b.id AS r_id").where("l_id < r_id")

    out = apply_matcher(cand, "l_id", "r_id", df, df, "id", "id",
                        "name", "name", None, "BAG_DISTANCE", 2.0,
                        comp_op="<=").collect()
    got = {(r.l_id, r.r_id): r._sim_score for r in out}
    names = dict(rows)
    exp = {(i, j): float(_bag_distance_py(names[i], names[j]))
           for i in names for j in names if i < j
           if _bag_distance_py(names[i], names[j]) <= 2}
    assert got == exp

    out2 = apply_matcher(cand, "l_id", "r_id", df, df, "id", "id",
                         "name", "name", WhitespaceTokenizer(),
                         "GENERALIZED_JACCARD", 0.4).collect()
    got2 = {(r.l_id, r.r_id): r._sim_score for r in out2}
    tok = WhitespaceTokenizer()
    exp2 = {}
    for i in names:
        for j in names:
            if i < j:
                s = generalized_jaccard_sim(tok.tokenize(names[i]),
                                            tok.tokenize(names[j]))
                if s >= 0.4:
                    exp2[(i, j)] = pytest.approx(s)
    assert got2 == exp2

    # parameterized instance through the callable path
    gj = GeneralizedJaccard(sim_threshold=1.0)
    out3 = apply_matcher(cand, "l_id", "r_id", df, df, "id", "id",
                         "name", "name", WhitespaceTokenizer(), gj, 0.3).collect()
    for r in out3:
        sa = set(tok.tokenize(names[r.l_id]))
        sb = set(tok.tokenize(names[r.r_id]))
        assert r._sim_score == pytest.approx(len(sa & sb) / len(sa | sb))


# --------------------------------------------- parity callable classes
def test_tversky_index_callable():
    from sparksimjoin import TverskyIndex

    tv = TverskyIndex(alpha=0.7, beta=0.3)
    # o=1, |A|=2, |B|=1: 1 / (1 + 0.7*1 + 0.3*0)
    assert tv(["a", "b"], ["a"]) == pytest.approx(1 / 1.7)
    assert TverskyIndex(0.5, 0.5)(["a"], ["a", "b"]) == pytest.approx(2 / 3)  # Dice
    assert TverskyIndex(1, 1)(["a"], ["a", "b"]) == pytest.approx(0.5)        # Jaccard
    assert tv([], []) == 1.0 and tv(["a"], []) == 0.0


def test_bag_and_hamming_callables():
    from sparksimjoin import BagDistance, HammingDistance

    assert BagDistance()("", "a") == 1.0
    assert BagDistance()("abb", "ba") == 1.0
    assert HammingDistance()("abcd", "abed") == 1.0
    with pytest.raises(ValueError):
        HammingDistance()("ab", "abc")


def test_fuzz_ratios():
    from sparksimjoin import (partial_ratio, ratio, token_set_ratio,
                              token_sort_ratio)

    assert ratio("abcd", "abcd") == 100.0
    assert ratio("", "") == 100.0
    assert ratio("abcd", "wxyz") == 0.0
    # difflib: M=3 matched chars, 2*3/(3+5)*100
    assert ratio("abc", "zabcz") == pytest.approx(75.0)
    assert partial_ratio("abc", "zabcz") == 100.0
    assert partial_ratio("", "xyz") == 0.0
    assert token_sort_ratio("world hello", "hello world") == 100.0
    # regression: an empty token set on ONE side must score 0 — the
    # empty intersection once rode ratio's both-empty convention to
    # 100 and matched everything
    assert token_set_ratio("", "hello world") == 0.0
    assert token_set_ratio("   ", "hello world") == 0.0
    assert token_set_ratio("", "") == 100.0
    # disjoint token sets: no shared tokens, plain sorted-diff ratio
    assert token_set_ratio("aa bb", "cc dd") < 50.0
    assert token_set_ratio("fuzzy was a bear", "fuzzy fuzzy was a bear") == 100.0
    assert token_set_ratio("a b c", "a b c") == 100.0


def test_fuzz_through_matcher(spark):
    from sparksimjoin import apply_matcher, token_sort_ratio

    rows = [(1, "hello world"), (2, "world hello"), (3, "bye moon")]
    df = spark.createDataFrame(rows, ["id", "name"])
    cand = df.alias("a").crossJoin(df.alias("b")).selectExpr(
        "a.id AS l_id", "b.id AS r_id").where("l_id < r_id")
    out = apply_matcher(cand, "l_id", "r_id", df, df, "id", "id",
                        "name", "name", None, token_sort_ratio, 90.0).collect()
    assert {(r.l_id, r.r_id) for r in out} == {(1, 2)}


# ------------------------------------------------ TfIdf / Editex / fuzz
def test_tfidf_callable_hand_values():
    import math

    from sparksimjoin import TfIdf

    corpus = [["a", "b"], ["a", "c"], ["d"]]
    # undampened: idf(a)=1.5, idf(b)=idf(c)=3; x=[a,b], y=[a,c]
    # dot = 1.5*1.5 = 2.25; both norms² = 1.5² + 3² = 11.25
    t = TfIdf(corpus, dampen=False)
    assert t(["a", "b"], ["a", "c"]) == pytest.approx(2.25 / 11.25)
    # dampened (the py_stringmatching default): v = ln(idf)·ln(tf+1)
    va = math.log(1.5) * math.log(2)
    vb = math.log(3.0) * math.log(2)
    td = TfIdf(corpus)
    assert td(["a", "b"], ["a", "c"]) == pytest.approx(va * va / (va * va + vb * vb))
    # tokens absent from the corpus are skipped (upstream convention)
    assert t(["zz"], ["zz"]) == 0.0
    # local fallback + dampen: every shared token has df=2 -> idf=1 ->
    # ln 0 -> score 0 even on identical bags — upstream's own
    # documented behavior, reproduced deliberately
    assert TfIdf()(["a", "b"], ["a", "b"]) == 0.0
    # local fallback, undampened: plain cosine of tf vectors
    assert TfIdf(dampen=False)(["a", "b"], ["a", "b"]) == pytest.approx(1.0)
    assert TfIdf(dampen=False)(["a", "a", "b"], ["a", "b"]) < 1.0
    assert TfIdf()([], ["a"]) == 0.0


def test_editex_hand_values():
    from sparksimjoin import Editex

    e = Editex()
    assert e("", "") == 0.0
    assert e("abc", "abc") == 0.0
    assert e("cat", "kat") == 1.0    # c~k share {ckq}
    assert e("nina", "mina") == 1.0  # m~n share {mn}
    assert e("dime", "time") == 1.0  # d~t share {dt}
    assert e("a", "") == 2.0         # boundary deletion at mismatch cost
    assert e("who", "wo") == 1.0     # silent-h rule: prev char is w
    assert e("aha", "aa") == 2.0     # h after a: full deletion cost
    assert e("CAT", "kat") == 1.0    # case-insensitive
    assert e("dog", "fog") == 2.0    # d,f share no group
    # parameterized costs flow through
    e2 = Editex(match_cost=0, group_cost=2, mismatch_cost=4)
    assert e2("cat", "kat") == 2.0


def test_editex_symmetry_and_levenshtein_bound():
    import random

    from sparksimjoin import Editex

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            row = [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                row[j] = min(prev[j] + 1, row[j - 1] + 1,
                             prev[j - 1] + (ca != cb))
            prev = row
        return prev[len(b)]

    e = Editex()
    rng = random.Random(5)
    alpha = "abdhw t"
    for _ in range(200):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 7)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 7)))
        assert e(a, b) == e(b, a)          # symmetric by construction
        assert e(a, a) == 0.0
        # every unit edit costs at most mismatch_cost=2 in editex
        assert e(a, b) <= 2 * lev(a, b)


def test_partial_token_sort_ratio():
    from sparksimjoin import partial_token_sort_ratio

    assert partial_token_sort_ratio("b a", "a b") == 100.0
    # sorted("world hello") is a contiguous window of
    # sorted("hello world extra") = "extra hello world"
    assert partial_token_sort_ratio("world hello", "hello world extra") == 100.0
    assert partial_token_sort_ratio("", "") == 100.0
    assert 0.0 <= partial_token_sort_ratio("abc def", "xyz qrs") < 50.0


def test_editex_through_matcher(spark):
    rows = [(1, "cat"), (2, "kat"), (3, "dog")]
    df = spark.createDataFrame(rows, ["id", "name"])
    cand = df.alias("a").crossJoin(df.alias("b")).selectExpr(
        "a.id AS l_id", "b.id AS r_id").where("l_id < r_id")
    out = apply_matcher(cand, "l_id", "r_id", df, df, "id", "id",
                        "name", "name", None, "EDITEX", 1.0,
                        comp_op="<=").collect()
    assert {(r.l_id, r.r_id): r._sim_score for r in out} == {(1, 2): 1.0}


def test_tfidf_through_matcher_callable(spark):
    from sparksimjoin import TfIdf
    from sparksimjoin.tokenizers import WhitespaceTokenizer

    rows = [(1, "red widget"), (2, "red widget"), (3, "blue bolt")]
    df = spark.createDataFrame(rows, ["id", "name"])
    cand = df.alias("a").crossJoin(df.alias("b")).selectExpr(
        "a.id AS l_id", "b.id AS r_id").where("l_id < r_id")
    fn = TfIdf([["red", "widget"], ["red", "widget"], ["blue", "bolt"]],
               dampen=False)
    out = apply_matcher(cand, "l_id", "r_id", df, df, "id", "id",
                        "name", "name", WhitespaceTokenizer(), fn,
                        0.9).collect()
    assert {(r.l_id, r.r_id) for r in out} == {(1, 2)}
    assert all(abs(r._sim_score - 1.0) < 1e-12 for r in out)
