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


class TfIdf:
    """TF-IDF cosine as a token-list callable — upstream-API parity
    with py_stringmatching's ``TfIdf(corpus_list, dampen)``, the class
    users pass to ``apply_matcher`` (``[R] py_stringsimjoin/matcher/
    apply_matcher.py``, the extension point). The first-class blocked
    join lives in ``joins/tfidf.py`` and implements the undampened
    form with exact integer weights; THIS callable carries the
    dampened log variant (the py_stringmatching default) and the
    no-corpus local fallback.

    Semantics (bag/multiset tokens):

    - ``corpus_list`` given: ``df(t)`` = number of corpus documents
      containing ``t``; ``N`` = corpus size. Tokens absent from the
      corpus are SKIPPED (contribute nothing) — the upstream
      convention.
    - ``corpus_list=None``: the two input bags themselves are the
      corpus (``N = 2``, df counted over them) — upstream's local
      fallback.
    - per-token values: ``idf = N / df``; dampened ``v = ln(idf) ·
      ln(tf + 1)``, undampened ``v = idf · tf``;
    - score = cosine of the two value vectors; 0.0 when the dot
      product is 0 (incl. empty inputs).
    """

    def __init__(self, corpus_list=None, dampen: bool = True):
        self.dampen = bool(dampen)
        if corpus_list is None:
            self._df = None
            self._n = 0
        else:
            df: Counter = Counter()
            n = 0
            for doc in corpus_list:
                n += 1
                df.update(set(doc))
            self._df = df
            self._n = n

    def get_raw_score(self, l_tokens, r_tokens) -> float:
        import math

        tf_x, tf_y = Counter(l_tokens), Counter(r_tokens)
        if self._df is None:
            curr_df: dict = {t: 1 for t in tf_x}
            for t in tf_y:
                curr_df[t] = curr_df.get(t, 0) + 1
            corpus_size = 2
        else:
            curr_df, corpus_size = self._df, self._n
        v_x_y = v_x_2 = v_y_2 = 0.0
        for element in tf_x.keys() | tf_y.keys():
            df_elem = curr_df.get(element)
            if not df_elem:
                continue
            idf = corpus_size * 1.0 / df_elem
            if self.dampen:
                v_x = math.log(idf) * math.log(tf_x[element] + 1) if element in tf_x else 0.0
                v_y = math.log(idf) * math.log(tf_y[element] + 1) if element in tf_y else 0.0
            else:
                v_x = idf * tf_x[element] if element in tf_x else 0.0
                v_y = idf * tf_y[element] if element in tf_y else 0.0
            v_x_y += v_x * v_y
            v_x_2 += v_x * v_x
            v_y_2 += v_y * v_y
        return 0.0 if v_x_y == 0.0 else v_x_y / (math.sqrt(v_x_2) * math.sqrt(v_y_2))

    __call__ = get_raw_score


#: Editex letter groups (Zobel & Dart, SIGIR 1996, Table 1): letters
#: that sound alike substitute at group_cost instead of mismatch_cost.
#: A letter may sit in several groups (e.g. c ~ {ckq} and {csz}).
EDITEX_GROUPS = (
    "aeiouy", "bp", "ckq", "dt", "lr", "mn", "gj", "fpv", "sxz", "csz",
)


class Editex:
    """Editex phonetic edit distance (Zobel & Dart, SIGIR 1996 —
    "Phonetic string matching: lessons from information retrieval") as
    a raw-string callable for ``apply_matcher(tokenizer=None)``, with
    the conventional costs (match 0, group 1, mismatch 2). Distance
    semantics — pair with comp_op ``<=``.

    Recurrence (1-based, both strings notionally prefixed with a
    boundary char):

    - ``r(a, b)`` = match_cost if ``a == b``; group_cost if a and b
      share a letter group; else mismatch_cost;
    - ``d(prev, cur)`` (deletion cost) = ``r(prev, cur)`` except it is
      group_cost when ``prev ∈ {h, w}`` and ``prev != cur`` (silent
      h/w rule);
    - ``ed(i, j) = min(ed(i-1, j) + d(s[i-1], s[i]),
      ed(i, j-1) + d(t[j-1], t[j]), ed(i-1, j-1) + r(s[i], t[j]))``.

    Case-insensitive (letters are lowercased before grouping — the
    groups are defined over letters; non-letters only ever match
    themselves at match_cost or anything else at mismatch_cost)."""

    def __init__(self, match_cost: int = 0, group_cost: int = 1,
                 mismatch_cost: int = 2):
        self.match_cost = match_cost
        self.group_cost = group_cost
        self.mismatch_cost = mismatch_cost
        self._groups = {}
        for gi, g in enumerate(EDITEX_GROUPS):
            for ch in g:
                self._groups.setdefault(ch, set()).add(gi)

    def _r(self, a: str, b: str) -> int:
        if a == b:
            return self.match_cost
        if self._groups.get(a, set()) & self._groups.get(b, frozenset()):
            return self.group_cost
        return self.mismatch_cost

    def _d(self, prev: str, cur: str) -> int:
        if prev != cur and prev in "hw":
            return self.group_cost
        return self._r(prev, cur)

    def get_raw_score(self, s1: str, s2: str) -> float:
        s = " " + s1.lower()
        t = " " + s2.lower()
        l1, l2 = len(s) - 1, len(t) - 1
        if l1 == 0:
            return float(sum(self._d(t[j - 1], t[j]) for j in range(1, l2 + 1)))
        if l2 == 0:
            return float(sum(self._d(s[i - 1], s[i]) for i in range(1, l1 + 1)))
        prev_row = [0] * (l2 + 1)
        for j in range(1, l2 + 1):
            prev_row[j] = prev_row[j - 1] + self._d(t[j - 1], t[j])
        for i in range(1, l1 + 1):
            row = [prev_row[0] + self._d(s[i - 1], s[i])] + [0] * l2
            for j in range(1, l2 + 1):
                row[j] = min(
                    prev_row[j] + self._d(s[i - 1], s[i]),
                    row[j - 1] + self._d(t[j - 1], t[j]),
                    prev_row[j - 1] + self._r(s[i], t[j]),
                )
            prev_row = row
        return float(prev_row[l2])

    __call__ = get_raw_score


class Soundex:
    """Soundex as a SIMILARITY MEASURE (py_stringmatching-API parity):
    1.0 iff the two strings' American Soundex codes are equal, else
    0.0 — a raw-string callable for ``apply_matcher(tokenizer=None)``.
    The encoding itself (and the blocking that uses it) lives in
    ``sparksimjoin.blocking`` (``soundex_expr`` / ``soundex_py`` /
    ``phonetic_candidates``)."""

    def get_raw_score(self, s1: str, s2: str) -> float:
        from .blocking import soundex_py

        return 1.0 if soundex_py(s1) == soundex_py(s2) else 0.0

    __call__ = get_raw_score
