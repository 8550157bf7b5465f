"""Tests: B-cubed clustering metrics + threshold-tightening cluster
refinement (brute-force twins, label conventions, guards)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from sparksimjoin.clustering import connected_components, refine_clusters
from sparksimjoin.evaluation import bcubed_contributions, bcubed_metrics


# ---- B-cubed ---------------------------------------------------------


def _assign(spark, rows):
    return spark.createDataFrame(rows, "id bigint, cluster_id bigint")


def _brute_bcubed(pred: dict, gold: dict):
    """Per-element definition over the shared id universe."""
    ids = sorted(set(pred) & set(gold))
    n = len(ids)
    ps = rs = 0.0
    for e in ids:
        c = [x for x in ids if pred[x] == pred[e]]
        l = [x for x in ids if gold[x] == gold[e]]
        inter = len(set(c) & set(l))
        ps += inter / len(c)
        rs += inter / len(l)
    p, r = ps / n, rs / n
    f1 = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return p, r, f1


PRED = {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 6, 8: 6, 9: 6}
GOLD = {1: 1, 2: 1, 3: 4, 4: 4, 5: 4, 6: 6, 7: 6, 8: 8, 9: 8}


def test_bcubed_metrics_brute_force(spark):
    pred = _assign(spark, list(PRED.items()))
    gold = _assign(spark, list(GOLD.items()))
    row = bcubed_metrics(pred, gold).collect()[0]
    p, r, f1 = _brute_bcubed(PRED, GOLD)
    assert row["n_ids"] == 9
    assert row["bcubed_precision"] == pytest.approx(p, abs=1e-12)
    assert row["bcubed_recall"] == pytest.approx(r, abs=1e-12)
    assert row["bcubed_f1"] == pytest.approx(f1, abs=1e-12)


def test_bcubed_contributions_exact(spark):
    pred = _assign(spark, list(PRED.items()))
    gold = _assign(spark, list(GOLD.items()))
    got = {
        (r["side"], r["cluster_id"]): (r["n_members"], r["sum_nij_sq"],
                                       r["contribution"])
        for r in bcubed_contributions(pred, gold).collect()
    }
    # pred cluster 1 = {1,2,3}: cells vs gold -> {1:{1,2}, 4:{3}} ->
    # sum sq = 4 + 1 = 5
    assert got[("precision", "1")] == (3, 5, 5 / 3)
    # gold cluster 4 = {3,4,5}: cells vs pred -> {1:{3}, 4:{4,5}} -> 1+4
    assert got[("recall", "4")] == (3, 5, 5 / 3)
    # global sums reproduce the brute force
    p, r, _ = _brute_bcubed(PRED, GOLD)
    psum = sum(v[2] for (s, _), v in got.items() if s == "precision")
    rsum = sum(v[2] for (s, _), v in got.items() if s == "recall")
    assert psum / 9 == pytest.approx(p, abs=1e-12)
    assert rsum / 9 == pytest.approx(r, abs=1e-12)


def test_bcubed_identical_clusterings_perfect(spark):
    pred = _assign(spark, list(PRED.items()))
    row = bcubed_metrics(pred, pred).collect()[0]
    assert row["bcubed_precision"] == 1.0
    assert row["bcubed_recall"] == 1.0
    assert row["bcubed_f1"] == 1.0


def test_bcubed_inner_join_universe(spark):
    """Ids labeled on only one side don't contribute."""
    pred = _assign(spark, list(PRED.items()) + [(99, 99)])
    gold = _assign(spark, list(GOLD.items()) + [(98, 98)])
    row = bcubed_metrics(pred, gold).collect()[0]
    p, r, _ = _brute_bcubed(PRED, GOLD)
    assert row["n_ids"] == 9
    assert row["bcubed_precision"] == pytest.approx(p, abs=1e-12)
    assert row["bcubed_recall"] == pytest.approx(r, abs=1e-12)


def test_bcubed_mega_cluster_vs_pairwise(spark):
    """The motivating property: one mega-cluster prediction scores
    high pairwise recall but is punished by B-cubed precision."""
    gold = _assign(spark, [(i, (i - 1) // 2 * 2 + 1) for i in range(1, 11)])
    mega = _assign(spark, [(i, 1) for i in range(1, 11)])
    row = bcubed_metrics(mega, gold).collect()[0]
    assert row["bcubed_recall"] == 1.0
    assert row["bcubed_precision"] == pytest.approx(0.2, abs=1e-12)


# ---- refine_clusters -------------------------------------------------


def _uf_components(ids, edges):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min member id
    comp = {}
    for i in ids:
        comp.setdefault(find(i), []).append(i)
    return {i: min(members) for r, members in comp.items() for i in members}


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(a, b, s) for a, b, s in edges],
        "l_id bigint, r_id bigint, _sim_score double",
    )


def _brute_refine(ids, edges, tighten, max_size=None, min_density=None):
    comp = _uf_components(ids, [(a, b) for a, b, _ in edges])
    clusters = {}
    for i, c in comp.items():
        clusters.setdefault(c, set()).add(i)
    intra = {}
    for a, b, s in edges:
        if a != b and comp[a] == comp[b]:
            key = (min(a, b), max(a, b))
            intra.setdefault(comp[a], {})
            intra[comp[a]][key] = max(s, intra[comp[a]].get(key, -1))
    out = {}
    for c, members in clusters.items():
        n, m = len(members), len(intra.get(c, {}))
        suspect = False
        if max_size is not None and n > max_size:
            suspect = True
        if min_density is not None and n > 1 and m / (n * (n - 1) / 2) < min_density:
            suspect = True
        if not suspect:
            for i in members:
                out[i] = c
        else:
            keep = [(a, b) for (a, b), s in intra[c].items()
                    if s >= tighten] if c in intra else []
            sub = _uf_components(sorted(members), keep)
            out.update(sub)
    return out


# bridge topology: two triangles {1,2,3} and {4,5,6} joined by one
# weak 3-4 edge, plus a clean pair {10,11} and a singleton-by-edge 20-21
EDGES = [
    (1, 2, 0.9), (2, 3, 0.95), (1, 3, 0.85),
    (4, 5, 0.9), (5, 6, 0.92), (4, 6, 0.88),
    (3, 4, 0.55),
    (10, 11, 0.9),
    (20, 21, 0.5),
]
IDS = [1, 2, 3, 4, 5, 6, 10, 11, 20, 21]


def _run_refine(spark, tighten, **kw):
    e = _edges_df(spark, EDGES)
    assign = connected_components(e, "l_id", "r_id")
    got = refine_clusters(assign, e, tighten, **kw)
    return {r["id"]: r["component"] for r in got.collect()}


def test_refine_splits_bridge_by_size(spark):
    got = _run_refine(spark, 0.8, max_cluster_size=4)
    exp = _brute_refine(IDS, EDGES, 0.8, max_size=4)
    assert got == exp
    # the bridged 6-cluster split into the two triangles
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == got[6] == 4
    # untouched clusters keep their labels
    assert got[10] == got[11] == 10
    assert got[20] == got[21] == 20


def test_refine_by_density(spark):
    # the 6-node bridge cluster has 7 edges / C(6,2)=15 -> 0.467
    got = _run_refine(spark, 0.8, min_density=0.5)
    exp = _brute_refine(IDS, EDGES, 0.8, min_density=0.5)
    assert got == exp
    assert got[1] != got[4]
    # triangles are cliques (density 1.0) -> untouched
    assert got[10] == 10 and got[20] == 20


def test_refine_members_losing_all_edges_become_singletons(spark):
    # tighten above every score: every suspect member isolates
    got = _run_refine(spark, 0.99, max_cluster_size=4)
    for i in (1, 2, 3, 4, 5, 6):
        assert got[i] == i
    assert got[10] == 10 and got[11] == 10


def test_refine_orientation_and_duplicate_edges(spark):
    """Reversed + duplicated edges must not change the result (the
    undirected best-score dedup)."""
    dup = EDGES + [(b, a, s) for a, b, s in EDGES] + [(1, 2, 0.7)]
    e = _edges_df(spark, dup)
    assign = connected_components(e, "l_id", "r_id")
    got = {r["id"]: r["component"]
           for r in refine_clusters(assign, e, 0.8,
                                    max_cluster_size=4).collect()}
    exp = _brute_refine(IDS, EDGES, 0.8, max_size=4)
    assert got == exp


def test_refine_randomized_brute_force(spark):
    """Randomized graphs (deterministic seeds) vs the union-find twin
    across both criteria."""
    import random

    for seed in (7, 21, 40):
        rng = random.Random(seed)
        ids = list(range(1, 25))
        edges = []
        for a, b in itertools.combinations(ids, 2):
            if rng.random() < 0.12:
                edges.append((a, b, round(rng.random(), 3)))
        if not edges:
            continue
        e = _edges_df(spark, edges)
        assign = connected_components(e, "l_id", "r_id")
        all_ids = sorted({x for a, b, _ in edges for x in (a, b)})
        for kw in ({"max_cluster_size": 5}, {"min_density": 0.6},
                   {"max_cluster_size": 5, "min_density": 0.6}):
            got = {r["id"]: r["component"]
                   for r in refine_clusters(assign, e, 0.5, **kw).collect()}
            assert got == _brute_refine(all_ids, edges, 0.5,
                                        max_size=kw.get("max_cluster_size"),
                                        min_density=kw.get("min_density")), kw


def test_refine_validation(spark):
    e = _edges_df(spark, EDGES)
    assign = connected_components(e, "l_id", "r_id")
    with pytest.raises(ValueError, match="at least one"):
        refine_clusters(assign, e, 0.8)
    with pytest.raises(ValueError, match="max_cluster_size"):
        refine_clusters(assign, e, 0.8, max_cluster_size=0)
    with pytest.raises(ValueError, match="min_density"):
        refine_clusters(assign, e, 0.8, min_density=1.5)
    bad = assign.select("id", F.col("component").cast("string").alias("component"))
    with pytest.raises(ValueError, match="labeling convention"):
        refine_clusters(bad, e, 0.8, max_cluster_size=4)


def test_refine_validate_labels_semantic_probe(spark):
    """validate_labels=True catches a foreign integer labeling that the
    dtype check alone cannot: labels of the right TYPE that are not
    member ids of their own cluster (and could therefore alias a kept
    cluster's label after refinement)."""
    e = spark.createDataFrame(
        [(1, 2, 0.9), (3, 4, 0.9)], "l_id bigint, r_id bigint, _sim_score double")
    good = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], "id bigint, component bigint")
    # min-member-id convention -> probe passes, plan builds and runs
    out = refine_clusters(good, e, 0.5, max_cluster_size=10,
                          validate_labels=True)
    assert out.count() == 4
    # foreign labeling: same dtype, labels 100/200 are nobody's id
    bad = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 200), (4, 200)], "id bigint, component bigint")
    with pytest.raises(ValueError, match="not member ids"):
        refine_clusters(bad, e, 0.5, max_cluster_size=10,
                        validate_labels=True)
    # default stays lazy and permissive (documented trade-off)
    refine_clusters(bad, e, 0.5, max_cluster_size=10)
