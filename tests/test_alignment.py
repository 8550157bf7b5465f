"""Sequence-alignment measures (sparksimjoin/alignment.py): kernel
correctness against independent brute-force twins + the closed-form
parameterizations the DuckDB oracles rely on, plus the matcher
integration (named measures and raw-string callables)."""

from __future__ import annotations

import random

import pytest

from sparksimjoin import (Affine, NeedlemanWunsch, SmithWaterman,
                          WhitespaceTokenizer, apply_matcher)
from sparksimjoin.alignment import (affine_gap_sim, needleman_wunsch_sim,
                                    smith_waterman_sim)


def _levenshtein(a: str, b: str) -> int:
    """Independent reference edit distance (classic rolling-row DP)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _lc_substr(a: str, b: str) -> int:
    """Independent longest-common-substring length (brute force)."""
    best = 0
    for i in range(len(a)):
        for j in range(i + best + 1, len(a) + 1):
            if a[i:j] in b:
                best = j - i
    return best


def _rand_strings(n, alphabet="abc", maxlen=9, seed=7):
    rng = random.Random(seed)
    return ["".join(rng.choice(alphabet) for _ in range(rng.randrange(maxlen + 1)))
            for _ in range(n)]


# ------------------------------------------------------------- kernels
def test_nw_hand_values():
    nw = NeedlemanWunsch()  # identity sim, gap 1
    assert nw("ab", "ab") == 2.0
    assert nw("ab", "ba") == 0.0
    assert nw("", "") == 0.0
    assert nw("abc", "") == -3.0
    assert nw("a", "ab") == 0.0  # match 1, one gap -1
    # free gaps degrade NW(identity) to LCS length: order still binds,
    # so "ab" vs "ba" can match only one character
    assert NeedlemanWunsch(gap_cost=0.0)("ab", "ba") == 1.0


def test_sw_hand_values():
    sw = SmithWaterman()
    assert sw("ab", "ba") == 1.0
    assert sw("", "xyz") == 0.0
    assert sw("abc", "zabcz") == 3.0
    # identity sim scores a mismatch 0 (not negative): spanning the
    # substitution beats clipping to either single-match run
    assert sw("axc", "ayc") == 2.0


def test_affine_hand_values():
    af = Affine()  # gap_start 1, continuation 0.5
    assert af("ab", "ab") == 2.0
    assert af("", "") == 0.0
    assert af("a", "") == -1.0
    assert af("ab", "") == -1.5
    # one gap run of length 2 costs 1.5; two separate length-1 runs cost 2
    # s1=aXXbY? keep it simple: "ab" vs "aZZb": best = a,b matched (2) minus
    # one run of 2 gaps (1.5) = 0.5... mismatching Z against nothing else.
    assert af("ab", "aZZb") == pytest.approx(0.5)


def test_nw_equals_neg_levenshtein():
    """The oracle parameterization: NW(sim 0/-1, gap 1) == -levenshtein."""
    nw = NeedlemanWunsch(gap_cost=1.0,
                         sim_func=lambda a, b: 0.0 if a == b else -1.0)
    ss = _rand_strings(40)
    for a in ss[:20]:
        for b in ss[20:]:
            assert nw(a, b) == -float(_levenshtein(a, b)), (a, b)


def test_sw_prohibitive_equals_longest_common_substring():
    """The oracle parameterization: SW with prohibitive mismatch/gap
    costs == longest-common-substring length (only contiguous exact
    runs can score)."""
    sw = SmithWaterman(gap_cost=1000.0,
                       sim_func=lambda a, b: 1.0 if a == b else -1000.0)
    ss = _rand_strings(30, alphabet="ab", maxlen=8, seed=11)
    for a in ss[:15]:
        for b in ss[15:]:
            assert sw(a, b) == float(_lc_substr(a, b)), (a, b)


def test_affine_prohibitive_equals_len_minus_hamming():
    """The oracle parameterization: equal-length strings + prohibitive
    gap costs force the all-diagonal alignment -> matches = len - hamming."""
    af = Affine(gap_start=1000.0, gap_continuation=1000.0)
    rng = random.Random(3)
    for _ in range(200):
        n = rng.randrange(1, 10)
        a = "".join(rng.choice("abc") for _ in range(n))
        b = "".join(rng.choice("abc") for _ in range(n))
        ham = sum(x != y for x, y in zip(a, b))
        assert af(a, b) == float(n - ham), (a, b)


def test_affine_equals_nw_when_linear():
    """gap_continuation == gap_start degrades Gotoh to linear gaps ==
    Needleman-Wunsch with that gap cost."""
    ss = _rand_strings(24, alphabet="abcd", maxlen=7, seed=5)
    for g in (0.5, 1.0, 2.0):
        nw = NeedlemanWunsch(gap_cost=g)
        af = Affine(gap_start=g, gap_continuation=g)
        for a in ss[:12]:
            for b in ss[12:]:
                assert af(a, b) == pytest.approx(nw(a, b)), (g, a, b)


def test_sw_nonnegative_and_bounds():
    ss = _rand_strings(30, seed=13)
    for a in ss[:15]:
        for b in ss[15:]:
            s = smith_waterman_sim(a, b)
            assert 0.0 <= s <= min(len(a), len(b))
            assert needleman_wunsch_sim(a, b) <= s  # global <= best local
            assert affine_gap_sim(a, a) == float(len(a))


# ------------------------------------------------------------- matcher
@pytest.fixture(scope="module")
def pairs_df(spark):
    rows = [(1, "martha"), (2, "marhta"), (3, "jones"), (4, "jonses"),
            (5, "x"), (6, "")]
    df = spark.createDataFrame(rows, ["id", "name"])
    cand = df.alias("a").crossJoin(df.alias("b")).selectExpr(
        "a.id AS l_id", "b.id AS r_id").where("l_id < r_id")
    return df, cand


def test_matcher_named_alignment_measures(spark, pairs_df):
    df, cand = pairs_df
    for name, kern in [("NEEDLEMAN_WUNSCH", needleman_wunsch_sim),
                       ("SMITH_WATERMAN", smith_waterman_sim),
                       ("AFFINE", affine_gap_sim)]:
        out = apply_matcher(cand, "l_id", "r_id", df, df, "id", "id",
                            "name", "name", None, name, -1e9).collect()
        got = {(r.l_id, r.r_id): r._sim_score for r in out}
        exp = {(a.id, b.id): kern(a.name, b.name)
               for a in df.collect() for b in df.collect() if a.id < b.id}
        assert got == pytest.approx(exp), name


def test_matcher_callable_raw_strings(spark, pairs_df):
    """tokenizer=None routes RAW strings to the callable (upstream
    convention for character-level sim functions)."""
    df, cand = pairs_df
    nw = NeedlemanWunsch(gap_cost=1.0,
                         sim_func=lambda a, b: 0.0 if a == b else -1.0)
    out = apply_matcher(cand, "l_id", "r_id", df, df, "id", "id",
                        "name", "name", None, nw, -2.0).collect()
    recs = {r.name for r in df.collect()}
    exp = {(a.id, b.id): -float(_levenshtein(a.name, b.name))
           for a in df.collect() for b in df.collect() if a.id < b.id}
    exp = {k: v for k, v in exp.items() if v >= -2.0}
    got = {(r.l_id, r.r_id): r._sim_score for r in out}
    assert got == exp
    assert recs  # fixture sanity


def test_matcher_callable_tokenized_path_unchanged(spark, pairs_df):
    """A tokenizer still delivers token lists to callables."""
    df, cand = pairs_df
    seen = []

    def fn(lt, rt):
        assert isinstance(lt, list) and isinstance(rt, list)
        return float(len(set(lt) & set(rt)))

    out = apply_matcher(cand, "l_id", "r_id", df, df, "id", "id",
                        "name", "name", WhitespaceTokenizer(), fn, 0.0)
    assert out.count() == 15 and not seen
