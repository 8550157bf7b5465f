"""weighted_jaccard_join: brute-force parity, two-table df semantics,
hot-token salting equivalence, boundary thresholds."""

from __future__ import annotations

import collections

import pytest

from sparksimjoin.joins.weighted import (
    WEIGHT_SCALE,
    weighted_cosine_join,
    weighted_jaccard_join,
)
from sparksimjoin.tokenizers import WhitespaceTokenizer

WS = WhitespaceTokenizer()


def _brute(l_docs, r_docs, t, self_join, measure="JACCARD"):
    """Python reimplementation: shared weight space over both inputs
    (counted once for a self-join)."""
    def toks(docs):
        out = {}
        for i, s in docs.items():
            if s is None:
                continue
            v = list(dict.fromkeys(s.split()))
            if v:
                out[i] = set(v)
        return out

    lt = toks(l_docs)
    rt = lt if self_join else toks(r_docs)
    corpus = list(lt.values()) + ([] if self_join else list(rt.values()))
    n = len(corpus)
    df = collections.Counter(tok for s in corpus for tok in s)
    w = {tok: (n * WEIGHT_SCALE) // c for tok, c in df.items()}
    tw_l = {i: sum(w[x] for x in s) for i, s in lt.items()}
    tw_r = tw_l if self_join else {i: sum(w[x] for x in s) for i, s in rt.items()}
    out = {}
    for a, sa in lt.items():
        for b, sb in rt.items():
            if self_join and not a < b:
                continue
            shared = sa & sb
            if not shared:
                continue
            o = sum(w[x] for x in shared)
            if measure == "JACCARD":
                sim = o / (tw_l[a] + tw_r[b] - o)
            elif measure == "DICE":
                sim = 2 * o / (tw_l[a] + tw_r[b])
            else:
                sim = o / (float(tw_l[a]) * float(tw_r[b])) ** 0.5
            if sim >= t:
                out[(a, b)] = sim
    return out


def _docs_df(spark, docs):
    return spark.createDataFrame(
        [(i, s) for i, s in docs.items()], "doc_id long, text string"
    )


def test_self_join_brute_force_parity(spark):
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = {
        i: " ".join(rng.choices(vocab, k=rng.randint(3, 12))) for i in range(80)
    }
    docs[80] = None
    docs[81] = "   "
    d = _docs_df(spark, docs)
    for t in (0.3, 0.5, 0.8):
        got = {
            (r.l_id, r.r_id): r._sim_score
            for r in weighted_jaccard_join(
                d, d, "doc_id", "doc_id", "text", "text", WS, t, self_join=True
            ).collect()
        }
        want = _brute(docs, docs, t, self_join=True)
        assert got.keys() == want.keys(), (t, got.keys() ^ want.keys())
        assert all(got[k] == want[k] for k in got)


def test_cosine_self_join_brute_force_parity(spark):
    import random

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(35)]
    docs = {
        i: " ".join(rng.choices(vocab, k=rng.randint(3, 10))) for i in range(70)
    }
    d = _docs_df(spark, docs)
    for t in (0.4, 0.7):
        got = {
            (r.l_id, r.r_id): r._sim_score
            for r in weighted_cosine_join(
                d, d, "doc_id", "doc_id", "text", "text", WS, t, self_join=True
            ).collect()
        }
        want = _brute(docs, docs, t, self_join=True, measure="COSINE")
        assert got.keys() == want.keys(), (t, got.keys() ^ want.keys())
        # sqrt path: brute force uses **0.5 on the same doubles
        assert all(abs(got[k] - want[k]) < 1e-12 for k in got)


def test_two_table_shared_weight_space(spark):
    l_docs = {1: "alpha beta gamma", 2: "alpha llc", 3: "zylker systems llc"}
    r_docs = {10: "alpha beta gamma delta", 11: "zylker llc", 12: "beta beta alpha"}
    got = {
        (r.l_id, r.r_id): r._sim_score
        for r in weighted_jaccard_join(
            _docs_df(spark, l_docs), _docs_df(spark, r_docs),
            "doc_id", "doc_id", "text", "text", WS, 0.2,
        ).collect()
    }
    want = _brute(l_docs, r_docs, 0.2, self_join=False)
    assert got == want


def test_rare_token_outweighs_common(spark):
    # "zylker" appears twice in the corpus, "llc" in most records: the
    # zylker pair must score far above an llc-only pair
    docs = {
        1: "zylker corp llc", 2: "zylker inc llc",
        3: "acme llc", 4: "foobar llc", 5: "baz llc", 6: "qux llc",
    }
    d = _docs_df(spark, docs)
    out = {
        (r.l_id, r.r_id): r._sim_score
        for r in weighted_jaccard_join(
            d, d, "doc_id", "doc_id", "text", "text", WS, 0.01, self_join=True
        ).collect()
    }
    assert out[(1, 2)] > 2 * out[(3, 4)]


def test_salting_equivalence_on_hot_token(spark):
    # one token in EVERY record -> df above the tiny salt_cap; salted
    # survivor set must equal the effectively-unsalted run
    docs = {i: f"hot tok{i % 5} tok{i % 7}" for i in range(60)}
    d = _docs_df(spark, docs)
    args = (d, d, "doc_id", "doc_id", "text", "text", WS, 0.3)
    salted = weighted_jaccard_join(*args, self_join=True, salt_cap=4).collect()
    plain = weighted_jaccard_join(*args, self_join=True, salt_cap=10**6).collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))
    want = _brute(docs, docs, 0.3, self_join=True)
    assert {(r.l_id, r.r_id) for r in salted} == set(want)


def test_identical_records_hit_threshold_one(spark):
    docs = {1: "a b c", 2: "a b c", 3: "a b d"}
    d = _docs_df(spark, docs)
    out = weighted_jaccard_join(
        d, d, "doc_id", "doc_id", "text", "text", WS, 1.0, self_join=True
    ).collect()
    assert [(r.l_id, r.r_id, r._sim_score) for r in out] == [(1, 2, 1.0)]


def test_plan_is_equi_join_not_cartesian(spark):
    """The candidate stage must be a hash/merge equi-join on the
    exploded prefix tid — never a cartesian pair enumeration. (The
    only nested-loop node allowed is the broadcast of the 1-row
    corpus-count frame into the weight table.)"""
    docs = {i: f"a{i % 9} b{i % 4} c{i % 3}" for i in range(40)}
    d = _docs_df(spark, docs)
    out = weighted_jaccard_join(
        d, d, "doc_id", "doc_id", "text", "text", WS, 0.5, self_join=True
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_salt_cap_validation(spark):
    d = _docs_df(spark, {1: "a"})
    with pytest.raises(ValueError):
        weighted_jaccard_join(
            d, d, "doc_id", "doc_id", "text", "text", WS, 0.5, salt_cap=0
        )


def test_weighted_dice_brute_force(spark):
    from sparksimjoin import weighted_dice_join

    docs = {
        1: "alpha beta gamma", 2: "alpha beta", 3: "zylker systems llc",
        4: "zylker llc", 5: "beta gamma delta eps", 6: "alpha beta gamma",
        7: None, 8: "llc",
    }
    d = _docs_df(spark, docs)
    for t in (0.5, 0.8):
        got = {
            (r.l_id, r.r_id): r._sim_score
            for r in weighted_dice_join(
                d, d, "doc_id", "doc_id", "text", "text", WS, t, self_join=True
            ).collect()
        }
        want = _brute(docs, docs, t, self_join=True, measure="DICE")
        assert got.keys() == want.keys(), (t, got.keys() ^ want.keys())
        assert all(abs(got[k] - want[k]) < 1e-12 for k in got)
