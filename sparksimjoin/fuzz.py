"""Fuzzy-ratio scorers (the fuzzywuzzy/thefuzz family): ratio,
partial_ratio, token_sort_ratio, token_set_ratio.

Convenience raw-string callables for ``apply_matcher(...,
tokenizer=None)`` — record-linkage practitioners reach for these
constantly, and the upstream package's answer is "bring your own
callable". Semantics follow the classic fuzzywuzzy definitions on
top of stdlib ``difflib.SequenceMatcher`` (``autojunk=False`` —
fuzzywuzzy's popular-element heuristic silently degrades long
strings), except scores are returned as UNROUNDED floats in [0, 100]
(fuzzywuzzy's ``int()`` truncation discards information; round at
the call site if porting thresholds verbatim).

CAVEAT (inherited from difflib, and present in fuzzywuzzy too):
``SequenceMatcher``'s greedy longest-block matching is ORDER-DEPENDENT,
so every ratio here can differ under argument swap (hypothesis finds
e.g. ``token_sort_ratio('a aa', 'aa ba')`` = 66.7 vs 44.4 swapped).
Symmetrize at the call site (``max(f(a,b), f(b,a))``) if your matcher
semantics require it.

These are deterministic pure-Python kernels with no SQL closed form
(SequenceMatcher's greedy longest-contiguous-block matching is not
LCS and is not expressible in the DuckDB oracle dialect), so they are
covered by unit tests rather than a ``queries()`` oracle row — the
matcher's callable path itself is hash-checked elsewhere
(matcher_callable_doc, nw_part, sw_part, affine_part)."""

from __future__ import annotations

from difflib import SequenceMatcher


def ratio(s1: str, s2: str) -> float:
    """2·M / (|s1| + |s2|) · 100, M = SequenceMatcher matched chars.
    Both empty -> 100.0 (identical)."""
    if not s1 and not s2:
        return 100.0
    return SequenceMatcher(None, s1, s2, autojunk=False).ratio() * 100.0


def partial_ratio(s1: str, s2: str) -> float:
    """Best ``ratio`` of the shorter string against same-length
    windows of the longer, windows anchored at SequenceMatcher's
    matching blocks (the classic fuzzywuzzy alignment heuristic)."""
    shorter, longer = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    if not shorter:
        return 100.0 if not longer else 0.0
    blocks = SequenceMatcher(None, shorter, longer,
                             autojunk=False).get_matching_blocks()
    best = 0.0
    for b in blocks:
        start = max(0, b.b - b.a)
        window = longer[start:start + len(shorter)]
        r = ratio(shorter, window)
        if r > best:
            best = r
            if best == 100.0:
                break
    return best


def _sorted_tokens(s: str) -> str:
    return " ".join(sorted(s.split()))


def token_sort_ratio(s1: str, s2: str) -> float:
    """``ratio`` over whitespace tokens re-joined in sorted order —
    word-order-insensitive."""
    return ratio(_sorted_tokens(s1), _sorted_tokens(s2))


def partial_token_sort_ratio(s1: str, s2: str) -> float:
    """``partial_ratio`` over whitespace tokens re-joined in sorted
    order — word-order-insensitive AND substring-tolerant (the
    fuzzywuzzy composition of the two)."""
    return partial_ratio(_sorted_tokens(s1), _sorted_tokens(s2))


def token_set_ratio(s1: str, s2: str) -> float:
    """The fuzzywuzzy token-set construction: with I = sorted token
    intersection, D1/D2 = sorted per-side differences, the max of
    ratio(I, I+D1), ratio(I, I+D2), ratio(I+D1, I+D2) — duplicate- and
    subset-tolerant. An empty token set on exactly one side scores 0
    (without this guard the empty intersection would ride ratio's
    both-empty -> 100 convention and match EVERYTHING); both sides
    empty -> 100 (identical), a documented deviation from fuzzywuzzy's
    0-on-empty short-circuit."""
    t1, t2 = set(s1.split()), set(s2.split())
    if not t1 or not t2:
        return 100.0 if not t1 and not t2 else 0.0
    inter = " ".join(sorted(t1 & t2))
    d1 = " ".join(sorted(t1 - t2))
    d2 = " ".join(sorted(t2 - t1))
    c1 = (inter + " " + d1).strip()
    c2 = (inter + " " + d2).strip()
    return max(ratio(inter, c1), ratio(inter, c2), ratio(c1, c2))
