"""Character-level similarity kernels beyond the reference's token-set
measures: Jaro and Jaro-Winkler (record-linkage staples the upstream
package reaches only through py_stringmatching callables via
``apply_matcher(sim_function=...)`` — ``[R] py_stringsimjoin/matcher/
apply_matcher.py``; here they are first-class, with a blocked join in
``joins/jaro.py``).

Definitions follow Winkler (1990) exactly as DuckDB 1.0 implements
them (``jaro_similarity`` / ``jaro_winkler_similarity``), verified
bit-identical on randomized corpora (tests/test_jaro.py):

- match window ``w = max(l1, l2) // 2 - 1`` (floor; never below 0);
- greedy left-to-right matching: s1[i] matches the FIRST unmatched
  equal char of s2 within ``[i-w, i+w]``;
- transpositions ``t`` = half the number of positions where the
  matched subsequences disagree;
- ``jaro = (m/l1 + m/l2 + (m-t)/m) / 3`` (this exact operation
  order — the doubles reproduce bit-identically cross-engine);
- Winkler boost: if ``jaro > 0.7``, add ``L * 0.1 * (1 - jaro)``
  where ``L`` = common prefix length capped at 4.

Empty-string convention: both empty -> 1.0 (the classic definition;
DuckDB returns 0.0 there — its only divergence, covered by a CASE in
the oracle SQL and by tests).

The kernels are plain-Python per pair (O(l1*l2) worst case) wrapped
in Arrow-batched pandas UDFs — the same batch shape as the matcher's
callable escape hatch. They sit AFTER blocking, so the pair volume is
candidate-bound; for extremely hot verify paths plug a compiled
kernel (e.g. rapidfuzz) at the marked site.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .filter_math import tversky_py as _tversky_py

WINKLER_PREFIX_WEIGHT = 0.1
WINKLER_BOOST_THRESHOLD = 0.7
WINKLER_MAX_PREFIX = 4


def jaro_sim(s1: str, s2: str) -> float:
    """Exact Jaro similarity (module docstring for the definition)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 and l2 == 0:
        return 1.0
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    matched2 = [False] * l2
    matched1 = [False] * l1
    m = 0
    for i in range(l1):
        c = s1[i]
        lo = i - window
        if lo < 0:
            lo = 0
        hi = i + window + 1
        if hi > l2:
            hi = l2
        for j in range(lo, hi):
            if not matched2[j] and s2[j] == c:
                matched1[i] = True
                matched2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if matched1[i]:
            while not matched2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    # exact operation order — see module docstring
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def jaro_winkler_sim(s1: str, s2: str) -> float:
    """Exact Jaro-Winkler similarity (boost threshold 0.7, prefix
    weight 0.1, prefix capped at 4 — the Winkler defaults DuckDB
    uses)."""
    j = jaro_sim(s1, s2)
    if j > WINKLER_BOOST_THRESHOLD:
        L = 0
        for a, b in zip(s1[:WINKLER_MAX_PREFIX], s2[:WINKLER_MAX_PREFIX]):
            if a != b:
                break
            L += 1
        return j + L * WINKLER_PREFIX_WEIGHT * (1.0 - j)
    return j


def monge_elkan_sim(l_tokens, r_tokens, inner=jaro_winkler_sim) -> float:
    """Monge-Elkan hybrid similarity: mean over the LEFT tokens of the
    best inner-measure match on the right —
    ``fsum_a max_b inner(a, b) / |A|`` (asymmetric by definition;
    py_stringmatching's MongeElkan with its default Jaro-Winkler
    inner). Both sides empty -> 1.0; one side empty -> 0.0.

    The mean uses ``math.fsum`` (exact summation), so the result is
    independent of token order and reproduces BIT-IDENTICALLY in any
    engine with exact summation — DuckDB's ``fsum`` in the oracle —
    with no rounding tolerance games."""
    import math

    if not l_tokens and not r_tokens:
        return 1.0
    if not l_tokens or not r_tokens:
        return 0.0
    return math.fsum(
        max(inner(a, b) for b in r_tokens) for a in l_tokens
    ) / len(l_tokens)


def generalized_jaccard_sim(l_tokens, r_tokens, inner=jaro_sim,
                            sim_threshold: float = 0.5) -> float:
    """Generalized Jaccard hybrid similarity: greedy maximal one-to-one
    matching of token pairs with ``inner(a, b) >= sim_threshold``,
    taken in (sim desc, left-token asc, right-token asc) order — the
    deterministic tie-break IS part of this contract — scored as
    ``fsum(matched sims) / (|A| + |B| - #matched)``.

    At ``sim_threshold=1.0`` only identical tokens match (any inner
    measure that is 1.0 iff equal, as Jaro is), so the score collapses
    to exact set Jaccard — the closed form the DuckDB oracle checks;
    general parameters are brute-force-tested. Both sides empty ->
    1.0; one side empty -> 0.0. Exact summation (``math.fsum``) keeps
    the result independent of match enumeration order."""
    import math

    if not l_tokens and not r_tokens:
        return 1.0
    if not l_tokens or not r_tokens:
        return 0.0
    A = sorted(set(l_tokens))
    B = sorted(set(r_tokens))
    cands = []
    for a in A:
        for b in B:
            s = inner(a, b)
            if s >= sim_threshold:
                cands.append((-s, a, b))
    cands.sort()
    used_a: set = set()
    used_b: set = set()
    matched = []
    for negs, a, b in cands:
        if a not in used_a and b not in used_b:
            used_a.add(a)
            used_b.add(b)
            matched.append(-negs)
    m = len(matched)
    return math.fsum(matched) / (len(A) + len(B) - m)


class GeneralizedJaccard:
    """Parameterizable callable form (``apply_matcher`` extension
    point: receives token lists when a tokenizer is given)."""

    def __init__(self, inner=jaro_sim, sim_threshold: float = 0.5):
        self.inner = inner
        self.sim_threshold = float(sim_threshold)

    def get_raw_score(self, l_tokens, r_tokens) -> float:
        return generalized_jaccard_sim(l_tokens, r_tokens, self.inner,
                                       self.sim_threshold)

    __call__ = get_raw_score


class TverskyIndex:
    """Parameterized Tversky index as a token-list callable —
    upstream-API parity (py_stringmatching's TverskyIndex is exactly
    what users pass to apply_matcher; the blocked join lives in
    joins/tversky.py). Set semantics; both empty -> 1.0."""

    def __init__(self, alpha: float = 0.5, beta: float = 0.5):
        self.alpha = float(alpha)
        self.beta = float(beta)

    def get_raw_score(self, l_tokens, r_tokens) -> float:
        # one kernel: the same function the Column twin and the DuckDB
        # oracle are checked against
        return _tversky_py(l_tokens, r_tokens, self.alpha, self.beta)

    __call__ = get_raw_score


class BagDistance:
    """Raw-string callable twin of the BAG_DISTANCE Column expression
    (bag_distance_expr below) — for apply_matcher(tokenizer=None) and
    for porting py_stringmatching code verbatim."""

    def get_raw_score(self, s1: str, s2: str) -> float:
        c1, c2 = Counter(s1), Counter(s2)
        return float(max(sum((c1 - c2).values()), sum((c2 - c1).values())))

    __call__ = get_raw_score


class HammingDistance:
    """Equal-length character mismatch count (raises on length
    mismatch, the upstream convention); the blocked join lives in
    joins/hamming.py."""

    def get_raw_score(self, s1: str, s2: str) -> float:
        if len(s1) != len(s2):
            raise ValueError("HammingDistance requires equal-length strings")
        return float(sum(a != b for a, b in zip(s1, s2)))

    __call__ = get_raw_score


def bag_distance_expr(l_col: Column, r_col: Column) -> Column:
    """Bag (multiset) distance between two strings as a PURE Column
    expression (JVM, whole-stage codegen — no UDF):
    ``max(|bag(s1) - bag(s2)|, |bag(s2) - bag(s1)|)`` on characters,
    the classic cheap lower bound of edit distance (Bartolini, Ciaccia
    & Patella 2002). O(distinct_chars * (l1 + l2)) per pair via
    higher-order array functions — strings are exploded with
    ``sequence/substring`` (not split-on-empty, whose boundary tokens
    are version-dependent)."""

    def chars(c: Column) -> Column:
        # sequence(1, 0) REVERSES to [1, 0] (Spark counts down when
        # start > stop), which would fabricate two phantom '' chars
        # for an empty string — guard with an explicit empty array
        return F.when(
            F.length(c) == 0, F.array().cast("array<string>")
        ).otherwise(
            F.transform(F.sequence(F.lit(1), F.length(c)),
                        lambda i: F.substring(c, i, 1))
        )

    lc, rc = chars(l_col), chars(r_col)

    def one_sided(a: Column, b: Column) -> Column:
        # sum over distinct chars of max(0, count_a - count_b)
        return F.aggregate(
            F.array_distinct(a),
            F.lit(0),
            lambda acc, ch: acc + F.greatest(
                F.size(F.filter(a, lambda x: x == ch))
                - F.size(F.filter(b, lambda x: x == ch)),
                F.lit(0),
            ),
        )

    return F.greatest(one_sided(lc, rc), one_sided(rc, lc)).cast("double")


def _batched(kernel):
    @F.pandas_udf(T.DoubleType())
    def udf(ls: pd.Series, rs: pd.Series) -> pd.Series:
        # Arrow-batched; the per-pair kernel is the plain-Python exact
        # implementation above. Compiled-kernel plug point: swap
        # `kernel` for e.g. rapidfuzz's C implementation here IF its
        # bit-level parity is re-verified against tests/test_jaro.py.
        return pd.Series(
            [
                None if a is None or b is None else kernel(a, b)
                for a, b in zip(ls, rs)
            ],
            dtype="float64",
        )

    return udf


def jaro_expr(l_col: Column, r_col: Column) -> Column:
    """Arrow-batched Jaro similarity column over two string columns."""
    return _batched(jaro_sim)(l_col, r_col)


def jaro_winkler_expr(l_col: Column, r_col: Column) -> Column:
    """Arrow-batched Jaro-Winkler similarity column."""
    return _batched(jaro_winkler_sim)(l_col, r_col)
