"""topk_pairs + pair/clustering evaluation metrics.

Oracle strategy mirrors the rest of the suite: brute-force Python
reimplementation on small frames, plus adversarial shapes (ties,
directed duplicates, empty intersections).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from sparksimjoin.evaluation import clustering_pairwise_metrics, pair_metrics
from sparksimjoin.ranking import topk_pairs


def _pairs_df(spark, rows):
    return spark.createDataFrame(rows, "l_id long, r_id long")


def test_topk_basic_and_ties(spark):
    scored = spark.createDataFrame(
        [
            (1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.8), (1, 13, 0.7),
            (2, 10, 0.5),
        ],
        "l_id long, r_id long, _sim_score double",
    )
    out = topk_pairs(scored, k=2).orderBy("l_id", "rank").collect()
    # tie at 0.8 broken by r_id asc: 11 beats 12
    assert [(r.l_id, r.r_id, r.rank) for r in out] == [
        (1, 10, 1), (1, 11, 2), (2, 10, 1)
    ]


def test_topk_deterministic_across_partitionings(spark):
    rows = [(i % 7, 100 + i, float((i * 37) % 10) / 10.0) for i in range(200)]
    scored = spark.createDataFrame(rows, "l_id long, r_id long, _sim_score double")
    a = topk_pairs(scored.repartition(13), k=3).collect()
    b = topk_pairs(scored.coalesce(1), k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # brute force
    want = []
    for lid, grp in itertools.groupby(
        sorted(rows, key=lambda t: (t[0], -t[2], t[1])), key=lambda t: t[0]
    ):
        want.extend(list(grp)[:3])
    got = sorted((r.l_id, r.r_id, r._sim_score) for r in a)
    assert got == sorted(want)


def test_topk_validation(spark):
    df = _pairs_df(spark, [(1, 2)])
    import pytest

    with pytest.raises(ValueError):
        topk_pairs(df.withColumn("_sim_score", F.lit(0.5)), k=0)
    with pytest.raises(ValueError):
        topk_pairs(df, k=1)  # no score col


def test_pair_metrics_canonicalization(spark):
    # pred holds directed dupes + a self-pair; gold holds the reverse
    # orientation — canonicalization must collapse all of that
    pred = _pairs_df(spark, [(1, 2), (2, 1), (3, 3), (3, 4)])
    gold = _pairs_df(spark, [(2, 1), (4, 5)])
    row = pair_metrics(pred, gold).collect()[0]
    assert (row.tp_pairs, row.fp_pairs, row.fn_pairs) == (1, 1, 1)
    assert (row.pred_pairs, row.gold_pairs) == (2, 2)
    assert row.precision == 0.5 and row.recall == 0.5 and row.f1 == 0.5


def test_pair_metrics_disjoint_and_empty(spark):
    pred = _pairs_df(spark, [(1, 2)])
    gold = _pairs_df(spark, [(3, 4)])
    row = pair_metrics(pred, gold).collect()[0]
    assert (row.tp_pairs, row.precision, row.recall, row.f1) == (0, 0.0, 0.0, 0.0)
    empty = _pairs_df(spark, []).filter(F.lit(False))
    row = pair_metrics(empty, gold).collect()[0]
    assert (row.tp_pairs, row.fp_pairs, row.fn_pairs) == (0, 0, 1)
    assert row.precision == 0.0 and row.recall == 0.0


def _brute_pairwise(assign):
    """set of unordered same-cluster id pairs from {id: cluster}."""
    out = set()
    for a, b in itertools.combinations(sorted(assign), 2):
        if assign[a] == assign[b]:
            out.add((a, b))
    return out


def test_clustering_pairwise_metrics_vs_brute_force(spark):
    import random

    rng = random.Random(7)
    ids = list(range(120))
    pred = {i: rng.randrange(8) for i in ids}
    gold = {i: rng.randrange(6) for i in ids}
    pdf = spark.createDataFrame(
        [(i, f"p{c}") for i, c in pred.items()], "id long, cluster_id string"
    )
    gdf = spark.createDataFrame(
        [(i, f"g{c}") for i, c in gold.items()], "id long, cluster_id string"
    )
    row = clustering_pairwise_metrics(pdf, gdf, "id").collect()[0]
    pp, gp = _brute_pairwise(pred), _brute_pairwise(gold)
    tp = len(pp & gp)
    assert row.n_ids == 120
    assert row.pred_pairs == len(pp) and row.gold_pairs == len(gp)
    assert row.tp_pairs == tp
    assert row.precision == tp / len(pp) and row.recall == tp / len(gp)
    p, r = tp / len(pp), tp / len(gp)
    assert row.f1 == 2.0 * p * r / (p + r)


def test_clustering_metrics_identical_clusterings(spark):
    df = spark.createDataFrame(
        [(i, i // 3) for i in range(30)], "id long, cluster_id long"
    )
    row = clustering_pairwise_metrics(df, df, "id").collect()[0]
    assert row.precision == 1.0 and row.recall == 1.0 and row.f1 == 1.0
    assert row.tp_pairs == row.pred_pairs == row.gold_pairs == 30  # 10 groups of 3


def test_clustering_metrics_id_universe_is_intersection(spark):
    pdf = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, cluster_id string"
    )
    gdf = spark.createDataFrame(
        [(1, "x"), (2, "x"), (99, "x")], "id long, cluster_id string"
    )
    row = clustering_pairwise_metrics(pdf, gdf, "id").collect()[0]
    # only ids 1,2 are in both; they share a cluster in both
    assert row.n_ids == 2 and row.tp_pairs == 1
    assert row.precision == 1.0 and row.recall == 1.0
