"""Sequence-alignment similarity measures: Needleman-Wunsch (global),
Smith-Waterman (local), and affine-gap global alignment (Gotoh 1982).

The upstream package reaches these only through py_stringmatching
callables via ``apply_matcher(sim_function=...)`` (``[R]
py_stringsimjoin/matcher/apply_matcher.py`` — the reference's
extension point); here they are first-class: instantiable measure
objects (usable directly as ``sim_function`` callables on RAW
strings, ``tokenizer=None``) plus named matcher measures
('NEEDLEMAN_WUNSCH', 'SMITH_WATERMAN', 'AFFINE') at the conventional
defaults (identity character match, gap_cost 1.0; affine gap_start 1.0
/ gap_continuation 0.5).

Semantics (stated precisely because they ARE the contract):

- ``NeedlemanWunsch(gap_cost, sim_func)``: global alignment maximizing
  ``sum sim(a_i, b_j) - gap_cost * (#gap characters)``. Raw score (may
  be negative); NW('', '') = 0, NW(s, '') = -gap_cost * len(s).
- ``SmithWaterman(gap_cost, sim_func)``: best-scoring LOCAL alignment
  (empty alignment allowed), so the score is always >= 0.
- ``Affine(gap_start, gap_continuation, sim_func)``: global alignment
  where a gap run of length L costs ``gap_start +
  (L-1) * gap_continuation`` (Gotoh's three-state recurrence; direct
  X<->Y state transitions disallowed, the standard simplification).
  Affine('', '') = 0; Affine(s, '') = -(gap_start +
  (len(s)-1) * gap_continuation).

``sim_func`` defaults to identity: 1.0 if the characters are equal
else 0.0. All kernels are exact plain-Python DP (O(|s1|*|s2|) per
pair) wrapped in Arrow-batched pandas UDFs for the matcher path —
candidate-bound like every verify kernel here; plug a compiled kernel
(rapidfuzz et al.) at simfunctions._batched's marked site if a hot
path demands it.

Oracle strategy (tests + __spark_entry__): general parameters are
property-tested against independent brute-force implementations;
the DuckDB value oracles use exact closed-form parameterizations —
NW(sim 0/-1, gap 1) == -levenshtein; SW with prohibitive
mismatch/gap == longest-common-substring length; affine with
prohibitive gaps on equal-length strings == len - hamming — so the
driver hash-checks real kernel outputs, not a watered-down stand-in.
"""

from __future__ import annotations

from typing import Callable

NEG_INF = float("-inf")


def _identity(a: str, b: str) -> float:
    return 1.0 if a == b else 0.0


class NeedlemanWunsch:
    """Global-alignment raw score; instances are plain callables
    ``(s1, s2) -> float`` so they slot into ``apply_matcher``'s
    callable path with ``tokenizer=None``."""

    def __init__(self, gap_cost: float = 1.0,
                 sim_func: Callable[[str, str], float] | None = None):
        self.gap_cost = float(gap_cost)
        self.sim_func = sim_func or _identity

    def get_raw_score(self, s1: str, s2: str) -> float:
        gap, sim = self.gap_cost, self.sim_func
        n, m = len(s1), len(s2)
        prev = [-gap * j for j in range(m + 1)]
        for i in range(1, n + 1):
            c1 = s1[i - 1]
            cur = [-gap * i] + [0.0] * m
            for j in range(1, m + 1):
                cur[j] = max(prev[j - 1] + sim(c1, s2[j - 1]),
                             prev[j] - gap,
                             cur[j - 1] - gap)
            prev = cur
        return prev[m]

    __call__ = get_raw_score


class SmithWaterman:
    """Local-alignment raw score (>= 0; the empty alignment scores 0)."""

    def __init__(self, gap_cost: float = 1.0,
                 sim_func: Callable[[str, str], float] | None = None):
        self.gap_cost = float(gap_cost)
        self.sim_func = sim_func or _identity

    def get_raw_score(self, s1: str, s2: str) -> float:
        gap, sim = self.gap_cost, self.sim_func
        m = len(s2)
        best = 0.0
        prev = [0.0] * (m + 1)
        for c1 in s1:
            cur = [0.0] * (m + 1)
            for j in range(1, m + 1):
                v = max(0.0,
                        prev[j - 1] + sim(c1, s2[j - 1]),
                        prev[j] - gap,
                        cur[j - 1] - gap)
                cur[j] = v
                if v > best:
                    best = v
            prev = cur
        return best

    __call__ = get_raw_score


class Affine:
    """Affine-gap global alignment (Gotoh): gap of length L costs
    ``gap_start + (L-1) * gap_continuation``."""

    def __init__(self, gap_start: float = 1.0, gap_continuation: float = 0.5,
                 sim_func: Callable[[str, str], float] | None = None):
        self.gap_start = float(gap_start)
        self.gap_continuation = float(gap_continuation)
        self.sim_func = sim_func or _identity

    def get_raw_score(self, s1: str, s2: str) -> float:
        go, gc, sim = self.gap_start, self.gap_continuation, self.sim_func
        n, m = len(s1), len(s2)
        if n == 0 and m == 0:
            return 0.0
        if n == 0 or m == 0:
            return -(go + (max(n, m) - 1) * gc)
        # three-state Gotoh over rolling rows: M = match/mismatch state,
        # X = gap in s2 (s1 char vs gap), Y = gap in s1
        Mp = [NEG_INF] * (m + 1)
        Xp = [NEG_INF] * (m + 1)
        Yp = [NEG_INF] * (m + 1)
        Mp[0] = 0.0
        for j in range(1, m + 1):
            Yp[j] = -(go + (j - 1) * gc)
        for i in range(1, n + 1):
            c1 = s1[i - 1]
            Mc = [NEG_INF] * (m + 1)
            Xc = [NEG_INF] * (m + 1)
            Yc = [NEG_INF] * (m + 1)
            Xc[0] = -(go + (i - 1) * gc)
            for j in range(1, m + 1):
                diag = max(Mp[j - 1], Xp[j - 1], Yp[j - 1])
                Mc[j] = diag + sim(c1, s2[j - 1])
                Xc[j] = max(Mp[j] - go, Xp[j] - gc)
                Yc[j] = max(Mc[j - 1] - go, Yc[j - 1] - gc)
            Mp, Xp, Yp = Mc, Xc, Yc
        return max(Mp[m], Xp[m], Yp[m])

    __call__ = get_raw_score


# default-parameter kernels for the named matcher measures
needleman_wunsch_sim = NeedlemanWunsch()
smith_waterman_sim = SmithWaterman()
affine_gap_sim = Affine()

ALIGNMENT_MEASURES = {
    "NEEDLEMAN_WUNSCH": needleman_wunsch_sim,
    "SMITH_WATERMAN": smith_waterman_sim,
    "AFFINE": affine_gap_sim,
}
