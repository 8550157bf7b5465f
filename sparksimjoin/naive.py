"""Naive nested-loop oracle used by the test suite — the same
expected-set strategy the reference's own tests use
(``[R] py_stringsimjoin/tests/test_join.py`` computes expectations
in-test via brute force; SURVEY.md §5.1). Pure Python/pandas; shares
tokenizers and comparison ops with the engine but computes
similarities independently."""

from __future__ import annotations

import math

import pandas as pd

from .filter_math import COMP_OP_PY, EDIT_DISTANCE, OVERLAP, sim_py
from .tokenizers import Tokenizer


def levenshtein(s1: str, s2: str) -> int:
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def naive_set_sim_join(
    l_pdf: pd.DataFrame,
    r_pdf: pd.DataFrame,
    l_key: str,
    r_key: str,
    l_attr: str,
    r_attr: str,
    tokenizer: Tokenizer,
    threshold: float,
    measure: str,
    comp_op: str = ">=",
    allow_empty: bool = True,
    allow_missing: bool = False,
    self_join: bool = False,
) -> list[tuple]:
    """-> [(l_id, r_id, score-or-None)] for every qualifying pair."""
    tok = tokenizer.with_return_set(True)
    out = []
    l_rows = list(zip(l_pdf[l_key], l_pdf[l_attr]))
    r_rows = list(zip(r_pdf[r_key], r_pdf[r_attr]))
    cmp = COMP_OP_PY[comp_op]
    for lid, ls in l_rows:
        l_missing = ls is None or (isinstance(ls, float) and math.isnan(ls))
        for rid, rs in r_rows:
            if self_join and not (lid < rid):
                continue
            r_missing = rs is None or (isinstance(rs, float) and math.isnan(rs))
            if l_missing or r_missing:
                if allow_missing:
                    out.append((lid, rid, None))
                continue
            lt, rt = tok.tokenize(ls), tok.tokenize(rs)
            if len(lt) == 0 and len(rt) == 0:
                if measure != OVERLAP and allow_empty and cmp(1.0, threshold):
                    out.append((lid, rid, 1.0))
                continue
            score = sim_py(lt, rt, measure)
            if (len(lt) == 0 or len(rt) == 0) and measure != OVERLAP:
                # one-side-empty pairs are never emitted by the reference
                continue
            if cmp(score, threshold):
                out.append((lid, rid, score))
    return out


def naive_tversky_join(
    l_pdf: pd.DataFrame,
    r_pdf: pd.DataFrame,
    l_key: str,
    r_key: str,
    l_attr: str,
    r_attr: str,
    tokenizer: Tokenizer,
    threshold: float,
    alpha: float,
    beta: float,
    comp_op: str = ">=",
    allow_empty: bool = True,
    allow_missing: bool = False,
    self_join: bool = False,
) -> list[tuple]:
    """Brute-force Tversky oracle (filter_math.tversky_py kernel;
    same empty/missing conventions as naive_set_sim_join)."""
    from .filter_math import tversky_py

    tok = tokenizer.with_return_set(True)
    cmp = COMP_OP_PY[comp_op]
    out = []
    for lid, ls in zip(l_pdf[l_key], l_pdf[l_attr]):
        l_missing = ls is None or (isinstance(ls, float) and math.isnan(ls))
        for rid, rs in zip(r_pdf[r_key], r_pdf[r_attr]):
            if self_join and not (lid < rid):
                continue
            r_missing = rs is None or (isinstance(rs, float) and math.isnan(rs))
            if l_missing or r_missing:
                if allow_missing:
                    out.append((lid, rid, None))
                continue
            lt, rt = tok.tokenize(ls), tok.tokenize(rs)
            if len(lt) == 0 and len(rt) == 0:
                if allow_empty and cmp(1.0, threshold):
                    out.append((lid, rid, 1.0))
                continue
            if len(lt) == 0 or len(rt) == 0:
                continue
            score = tversky_py(lt, rt, alpha, beta)
            if cmp(score, threshold):
                out.append((lid, rid, score))
    return out


def naive_hamming_join(
    l_pdf: pd.DataFrame,
    r_pdf: pd.DataFrame,
    l_key: str,
    r_key: str,
    l_attr: str,
    r_attr: str,
    threshold: float,
    comp_op: str = "<=",
    allow_missing: bool = False,
    self_join: bool = False,
) -> list[tuple]:
    """Brute-force Hamming oracle: equal-length pairs only (the
    join-predicate reading of the equal-length precondition)."""
    cmp = COMP_OP_PY[comp_op]
    out = []
    for lid, ls in zip(l_pdf[l_key], l_pdf[l_attr]):
        l_missing = ls is None or (isinstance(ls, float) and math.isnan(ls))
        for rid, rs in zip(r_pdf[r_key], r_pdf[r_attr]):
            if self_join and not (lid < rid):
                continue
            r_missing = rs is None or (isinstance(rs, float) and math.isnan(rs))
            if l_missing or r_missing:
                if allow_missing:
                    out.append((lid, rid, None))
                continue
            if len(ls) != len(rs):
                continue
            d = sum(a != b for a, b in zip(ls, rs))
            if cmp(d, threshold):
                out.append((lid, rid, float(d)))
    return out


def naive_jaro_join(
    l_pdf: pd.DataFrame,
    r_pdf: pd.DataFrame,
    l_key: str,
    r_key: str,
    l_attr: str,
    r_attr: str,
    threshold: float,
    winkler: bool = True,
    comp_op: str = ">=",
    allow_empty: bool = True,
    allow_missing: bool = False,
    self_join: bool = False,
) -> list[tuple]:
    """Brute-force Jaro / Jaro-Winkler oracle; exact kernels from
    simfunctions (themselves property-tested against DuckDB)."""
    from .simfunctions import jaro_sim, jaro_winkler_sim

    fn = jaro_winkler_sim if winkler else jaro_sim
    cmp = COMP_OP_PY[comp_op]
    out = []
    for lid, ls in zip(l_pdf[l_key], l_pdf[l_attr]):
        l_missing = ls is None or (isinstance(ls, float) and math.isnan(ls))
        for rid, rs in zip(r_pdf[r_key], r_pdf[r_attr]):
            if self_join and not (lid < rid):
                continue
            r_missing = rs is None or (isinstance(rs, float) and math.isnan(rs))
            if l_missing or r_missing:
                if allow_missing:
                    out.append((lid, rid, None))
                continue
            if len(ls) == 0 and len(rs) == 0:
                if allow_empty and cmp(1.0, threshold):
                    out.append((lid, rid, 1.0))
                continue
            score = fn(ls, rs)
            if cmp(score, threshold):
                out.append((lid, rid, score))
    return out


def naive_edit_distance_join(
    l_pdf: pd.DataFrame,
    r_pdf: pd.DataFrame,
    l_key: str,
    r_key: str,
    l_attr: str,
    r_attr: str,
    threshold: float,
    comp_op: str = "<=",
    allow_missing: bool = False,
    self_join: bool = False,
) -> list[tuple]:
    out = []
    cmp = COMP_OP_PY[comp_op]
    for lid, ls in zip(l_pdf[l_key], l_pdf[l_attr]):
        l_missing = ls is None or (isinstance(ls, float) and math.isnan(ls))
        for rid, rs in zip(r_pdf[r_key], r_pdf[r_attr]):
            if self_join and not (lid < rid):
                continue
            r_missing = rs is None or (isinstance(rs, float) and math.isnan(rs))
            if l_missing or r_missing:
                if allow_missing:
                    out.append((lid, rid, None))
                continue
            d = levenshtein(ls, rs)
            if cmp(d, threshold):
                out.append((lid, rid, float(d)))
    return out


class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def naive_connected_components(edges: list[tuple], nodes: list | None = None) -> dict:
    """-> {node: min-id representative of its component}."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    for n in nodes or []:
        uf.find(n)
    # path-compress everything, then remap representative to the true
    # min member of each component
    comp_members: dict = {}
    for n in list(uf.parent):
        comp_members.setdefault(uf.find(n), []).append(n)
    out = {}
    for root, members in comp_members.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out
