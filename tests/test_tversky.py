"""Tversky-index join: brute-force parity (the reference test
strategy, SURVEY.md §5.1), blocking-bound soundness under asymmetric
weights, and the degenerate-parameter guard."""

from __future__ import annotations

import math

import pytest

from sparksimjoin import QgramTokenizer, WhitespaceTokenizer, tversky_index_join
from sparksimjoin.filter_math import (
    sim_py,
    tversky_dice_block_threshold,
    tversky_py,
)
from sparksimjoin.fixtures import make_person_tables
from sparksimjoin.naive import naive_tversky_join

A_PDF, B_PDF = make_person_tables(60, 80, seed=7)


@pytest.fixture(scope="module")
def tables(spark):
    a = spark.createDataFrame(A_PDF).cache()
    b = spark.createDataFrame(B_PDF).cache()
    a.count(), b.count()
    return a, b


def _collect_pairs(df):
    out = {}
    for r in df.collect():
        d = r.asDict()
        key = (d["l_id"], d["r_id"])
        assert key not in out, f"duplicate pair {key}"
        out[key] = d.get("_sim_score")
    return out


def _assert_match(got, expected, ctx):
    assert set(got) == set(expected), (
        f"{ctx}: missing={sorted(set(expected) - set(got))[:10]} "
        f"extra={sorted(set(got) - set(expected))[:10]}"
    )
    for k, v in expected.items():
        g = got[k]
        if v is None:
            assert g is None, (ctx, k, g)
        else:
            assert g is not None and math.isclose(g, v, rel_tol=0, abs_tol=1e-9), (ctx, k, g, v)


# symmetric (== dice / jaccard scalings), mildly and strongly
# asymmetric (blocking bound loosest at alpha 4x beta), boundary t=1.0
CASES = [
    (0.5, 0.5, 0.5),
    (1.0, 1.0, 0.5),
    (0.7, 0.3, 0.55),
    (0.8, 0.2, 0.6),
    (0.5, 0.5, 1.0),
]


@pytest.mark.parametrize("alpha,beta,threshold", CASES)
@pytest.mark.parametrize(
    "tok", [WhitespaceTokenizer(), QgramTokenizer(qval=2, padding=True)],
    ids=["ws", "qg2"],
)
def test_tversky_join_parity(spark, tables, alpha, beta, threshold, tok):
    a, b = tables
    df = tversky_index_join(a, b, "id", "id", "name", "name", tok, threshold,
                            alpha=alpha, beta=beta)
    got = _collect_pairs(df)
    expected = dict(
        (k, v) for k, v, in (
            ((lid, rid), s)
            for lid, rid, s in naive_tversky_join(
                A_PDF, B_PDF, "id", "id", "name", "name", tok, threshold, alpha, beta
            )
        )
    )
    _assert_match(got, expected, f"TVERSKY({alpha},{beta})@{threshold}")


def test_tversky_self_join_with_missing(spark, tables):
    a, _ = tables
    tok = WhitespaceTokenizer()
    df = tversky_index_join(a, a, "id", "id", "name", "name", tok, 0.6,
                            alpha=0.7, beta=0.3, self_join=True, allow_missing=True)
    got = _collect_pairs(df)
    expected = dict(
        ((lid, rid), s)
        for lid, rid, s in naive_tversky_join(
            A_PDF, A_PDF, "id", "id", "name", "name", tok, 0.6, 0.7, 0.3,
            self_join=True, allow_missing=True,
        )
    )
    _assert_match(got, expected, "TVERSKY self+missing")


def test_tversky_kernel_specializations():
    """alpha=beta=0.5 is Dice, alpha=beta=1 is Jaccard, asymmetry
    orders scores the right way (smaller weight on the bigger
    residual -> higher score)."""
    x = ["a", "b", "c", "d"]
    y = ["a", "b", "e"]
    assert math.isclose(tversky_py(x, y, 0.5, 0.5), sim_py(x, y, "DICE"), abs_tol=1e-15)
    assert math.isclose(tversky_py(x, y, 1.0, 1.0), sim_py(x, y, "JACCARD"), abs_tol=1e-15)
    # x has 2 residual tokens, y has 1: down-weighting x's residual
    # (alpha small) must raise the score
    assert tversky_py(x, y, 0.2, 0.8) > tversky_py(x, y, 0.8, 0.2)
    assert tversky_py([], [], 0.5, 0.5) == 1.0
    assert tversky_py(["a"], [], 0.5, 0.5) == 0.0


def test_tversky_block_threshold_math():
    """t' specializations: alpha=beta=0.5 -> t'=t (dice identity);
    alpha=beta=1 -> t'=2t/(1+t) (the classic jaccard->dice map);
    always in (0, 1]; monotone in t."""
    for t in (0.1, 0.5, 0.9, 1.0):
        assert math.isclose(tversky_dice_block_threshold(t, 0.5, 0.5), t, rel_tol=1e-12)
        assert math.isclose(
            tversky_dice_block_threshold(t, 1.0, 1.0), 2 * t / (1 + t), rel_tol=1e-12
        )
        tp = tversky_dice_block_threshold(t, 0.9, 0.1)
        assert 0 < tp <= 1
    assert tversky_dice_block_threshold(0.3, 0.7, 0.2) < tversky_dice_block_threshold(
        0.6, 0.7, 0.2
    )


def test_tversky_rejects_degenerate_weights(spark, tables):
    a, b = tables
    with pytest.raises(AssertionError, match="alpha > 0 and beta > 0"):
        tversky_index_join(a, b, "id", "id", "name", "name",
                           WhitespaceTokenizer(), 0.5, alpha=0.0, beta=1.0)
