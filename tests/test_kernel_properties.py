"""Hypothesis property tests for the pure-Python measure kernels —
shrinking counterexample search over adversarial small alphabets
(complements the fixed-seed brute-force parity tests)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from sparksimjoin.alignment import Affine, NeedlemanWunsch, SmithWaterman
from sparksimjoin.fuzz import partial_ratio, ratio, token_set_ratio, token_sort_ratio
from sparksimjoin.simfunctions import (BagDistance, generalized_jaccard_sim,
                                       jaro_sim, jaro_winkler_sim)

# tiny alphabets maximize collisions/transpositions per string length
short = st.text(alphabet="ab", max_size=8)
word = st.text(alphabet="abc", min_size=0, max_size=6)
sentence = st.lists(word, max_size=4).map(" ".join)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(short, short)
def test_nw_levenshtein_identity(a, b):
    nw = NeedlemanWunsch(gap_cost=1.0, sim_func=lambda x, y: 0.0 if x == y else -1.0)
    assert nw(a, b) == -float(_lev(a, b))


@settings(max_examples=300, deadline=None)
@given(short, short)
def test_bag_distance_lower_bounds_levenshtein(a, b):
    assert BagDistance()(a, b) <= _lev(a, b)


@settings(max_examples=300, deadline=None)
@given(short, short)
def test_sw_prohibitive_is_longest_common_substring(a, b):
    sw = SmithWaterman(gap_cost=1000.0,
                       sim_func=lambda x, y: 1.0 if x == y else -1000.0)
    best = 0
    for i in range(len(a)):
        for j in range(i + 1, len(a) + 1):
            if a[i:j] in b and j - i > best:
                best = j - i
    assert sw(a, b) == float(best)


@settings(max_examples=200, deadline=None)
@given(short, short, st.sampled_from([0.5, 1.0, 2.0]))
def test_affine_linear_gaps_equal_nw(a, b, g):
    assert Affine(gap_start=g, gap_continuation=g)(a, b) == \
        NeedlemanWunsch(gap_cost=g)(a, b)


@settings(max_examples=300, deadline=None)
@given(word, word)
def test_jaro_symmetry_and_bounds(a, b):
    j = jaro_sim(a, b)
    assert j == jaro_sim(b, a)
    assert 0.0 <= j <= 1.0
    assert jaro_winkler_sim(a, b) >= j  # boost never decreases


@settings(max_examples=300, deadline=None)
@given(sentence, sentence)
def test_token_ratios_bounds_and_identity(s1, s2):
    """Bounds + self-identity only: SequenceMatcher's greedy block
    matching is order-dependent, so these ratios are NOT symmetric
    (hypothesis found token_sort_ratio('a aa','aa ba') = 66.7 vs 44.4
    swapped — inherited from difflib, documented in fuzz.py)."""
    for fn in (ratio, partial_ratio, token_sort_ratio, token_set_ratio):
        v = fn(s1, s2)
        assert 0.0 <= v <= 100.0, fn.__name__
    assert token_sort_ratio(s1, s1) == 100.0
    assert token_set_ratio(s1, s1) == 100.0


@settings(max_examples=300, deadline=None)
@given(st.lists(word.filter(bool), max_size=4),
       st.lists(word.filter(bool), max_size=4))
def test_gj_threshold_one_is_set_jaccard(A, B):
    got = generalized_jaccard_sim(A, B, sim_threshold=1.0)
    sa, sb = set(A), set(B)
    if not sa and not sb:
        exp = 1.0
    elif not sa or not sb:
        exp = 0.0
    else:
        exp = len(sa & sb) / len(sa | sb)
    assert math.isclose(got, exp, rel_tol=0, abs_tol=0)
