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

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
