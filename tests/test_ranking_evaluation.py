"""topk_pairs + pair/clustering evaluation metrics.

Oracle strategy mirrors the rest of the suite: brute-force Python
reimplementation on small frames, plus adversarial shapes (ties,
directed duplicates, empty intersections).
"""

from __future__ import annotations

import itertools

import pytest

from pyspark.sql import functions as F

from sparksimjoin.evaluation import (
    best_threshold,
    clustering_pairwise_metrics,
    pair_metrics,
    threshold_sweep,
)
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


def _brute_sweep(scored, gold, ts, cmp):
    """Python reimplementation: scored = {(a,b): best score}, gold =
    set of canonical pairs; per-threshold (tp, pred, gold) counts."""
    out = {}
    for t in ts:
        pred = {p for p, s in scored.items() if cmp(s, t)}
        out[t] = (len(pred & gold), len(pred), len(gold))
    return out


def test_threshold_sweep_vs_brute_force(spark):
    import random

    rng = random.Random(11)
    raw = []
    scored_best = {}
    for _ in range(300):
        a, b = rng.randrange(40), rng.randrange(40)
        if a == b:
            continue
        s = round(rng.random(), 3)
        raw.append((a, b, s))
        key = (min(a, b), max(a, b))
        scored_best[key] = max(scored_best.get(key, 0.0), s)
    gold = {(min(a, b), max(a, b))
            for a in range(40) for b in range(40)
            if a < b and rng.random() < 0.1}
    sdf = spark.createDataFrame(raw, "l_id long, r_id long, _sim_score double")
    gdf = _pairs_df(spark, sorted(gold))
    ts = [0.2, 0.4, 0.6, 0.8]
    rows = {r.threshold: r for r in threshold_sweep(sdf, gdf, ts).collect()}
    want = _brute_sweep(scored_best, gold, ts, lambda s, t: s >= t)
    assert set(rows) == set(ts)
    for t in ts:
        tp, pred, gld = want[t]
        r = rows[t]
        assert (r.tp_pairs, r.pred_pairs, r.gold_pairs) == (tp, pred, gld), t
        assert r.fp_pairs == pred - tp and r.fn_pairs == gld - tp
        if pred and gld and tp:
            p, rc = tp / pred, tp / gld
            assert r.precision == p and r.recall == rc
            assert r.f1 == 2.0 * p * rc / (p + rc)


def test_threshold_sweep_directed_dupes_and_le(spark):
    # directed duplicates keep the BEST score for the cut direction:
    # max for >=, min for <= (edit-distance style)
    sdf = spark.createDataFrame(
        [(1, 2, 0.9), (2, 1, 0.3), (3, 4, 2.0), (4, 3, 5.0)],
        "l_id long, r_id long, _sim_score double",
    )
    gdf = _pairs_df(spark, [(1, 2), (3, 4)])
    row = threshold_sweep(sdf, gdf, [0.5]).collect()
    ge = {r.threshold: r for r in row}
    assert ge[0.5].tp_pairs == 2  # (1,2) via max(0.9,0.3); (3,4) passes
    le = threshold_sweep(sdf, gdf, [3.0], comp_op="<=").collect()[0]
    # (1,2): min=0.3 <= 3 yes; (3,4): min(2,5)=2 <= 3 yes
    assert le.tp_pairs == 2 and le.pred_pairs == 2


def test_threshold_sweep_gold_only_pairs_are_fn_everywhere(spark):
    sdf = spark.createDataFrame(
        [(1, 2, 0.9)], "l_id long, r_id long, _sim_score double"
    )
    gdf = _pairs_df(spark, [(1, 2), (7, 8)])
    rows = threshold_sweep(sdf, gdf, [0.1, 0.95]).collect()
    by_t = {r.threshold: r for r in rows}
    assert by_t[0.1].fn_pairs == 1 and by_t[0.1].tp_pairs == 1
    assert by_t[0.95].fn_pairs == 2 and by_t[0.95].tp_pairs == 0


def test_threshold_sweep_single_pass(spark):
    """The sweep is ONE aggregation regardless of threshold count —
    no per-threshold scan/join in the plan."""
    sdf = spark.createDataFrame(
        [(1, 2, 0.9)], "l_id long, r_id long, _sim_score double"
    )
    gdf = _pairs_df(spark, [(1, 2)])
    plan = threshold_sweep(
        sdf, gdf, [i / 20 for i in range(1, 20)]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("join") == 1, plan


def test_threshold_sweep_validation_and_best(spark):
    import pytest

    sdf = spark.createDataFrame(
        [(1, 2, 0.9), (3, 4, 0.5), (5, 6, 0.4)],
        "l_id long, r_id long, _sim_score double",
    )
    gdf = _pairs_df(spark, [(1, 2), (3, 4)])
    with pytest.raises(ValueError):
        threshold_sweep(sdf, gdf, [])
    with pytest.raises(ValueError):
        threshold_sweep(sdf, gdf, [0.5], comp_op="=")
    sweep = threshold_sweep(sdf, gdf, [0.3, 0.45, 0.7])
    # 0.45: pred={12,34}, tp=2 -> f1=1.0; 0.3 adds fp; 0.7 loses tp
    assert best_threshold(sweep) == 0.45


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


# ---------------------------------------------------------- blocking eval
def test_blocking_metrics_brute(spark):
    from sparksimjoin.evaluation import blocking_metrics

    cand = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"), ("d", "d")],
        "l_id string, r_id string",
    )  # canonical distinct: {ab, ac, cd}
    gold = spark.createDataFrame(
        [("a", "b"), ("b", "d")], "l_id string, r_id string"
    )
    # 5 records -> C(5,2) = 10 comparisons
    row = blocking_metrics(cand, gold, total_pairs=10).collect()[0]
    assert (row["cand_pairs"], row["gold_pairs"], row["tp_pairs"]) == (3, 2, 1)
    assert row["total_pairs"] == 10
    assert row["pairs_completeness"] == 0.5
    assert row["pair_quality"] == pytest.approx(1 / 3)
    assert row["reduction_ratio"] == pytest.approx(0.7)


def test_blocking_metrics_empty_gold(spark):
    from sparksimjoin.evaluation import blocking_metrics

    cand = spark.createDataFrame([("a", "b")], "l_id string, r_id string")
    gold = spark.createDataFrame([], "l_id string, r_id string")
    row = blocking_metrics(cand, gold, total_pairs=1).collect()[0]
    assert row["pairs_completeness"] == 0.0
    assert row["pair_quality"] == 0.0
    assert row["reduction_ratio"] == 0.0


def test_blocking_metrics_losslessness_on_fixture(spark):
    """The engine's own PrefixFilter candidates must have blocking
    recall exactly 1.0 vs the true join — the filter-losslessness
    property expressed through the metric."""
    from sparksimjoin import WhitespaceTokenizer, jaccard_join
    from sparksimjoin.evaluation import blocking_metrics
    from sparksimjoin.filters import PrefixFilter
    from sparksimjoin.fixtures import make_person_tables

    a_pdf, _ = make_person_tables(50, 10, seed=3)
    a = spark.createDataFrame(a_pdf)
    ws = WhitespaceTokenizer()
    cand = PrefixFilter(ws, "JACCARD", 0.6, allow_empty=False).filter_tables(
        a, a, "id", "id", "name", "name", self_join=True
    ).select(F.col("l_id").cast("long"), F.col("r_id").cast("long"))
    gold = jaccard_join(a, a, "id", "id", "name", "name", ws, 0.6,
                        allow_empty=False, self_join=True).select(
        F.col("l_id").alias("l_id"), F.col("r_id").alias("r_id")
    )
    n = a.where(F.col("name").isNotNull()).count()
    row = blocking_metrics(cand, gold, total_pairs=n * (n - 1) // 2).collect()[0]
    assert row["pairs_completeness"] == 1.0
    assert 0.0 <= row["pair_quality"] <= 1.0
    assert row["cand_pairs"] <= n * (n - 1) // 2


# ------------------------------------------------------- mutual best


def _brute_mutual(pairs):
    canon = {}
    for l, r, s in pairs:
        if l == r:
            continue
        a, b = (l, r) if l < r else (r, l)
        canon[(a, b)] = s
    best = {}
    for (a, b), s in canon.items():
        for node, partner in ((a, b), (b, a)):
            cur = best.get(node)
            if cur is None or s > cur[0] or (s == cur[0] and partner < cur[1]):
                best[node] = (s, partner)
    return {
        (a, b): s
        for (a, b), s in canon.items()
        if best[a][1] == b and best[b][1] == a
    }


def test_mutual_best_brute_force(spark):
    from sparksimjoin.ranking import mutual_best_pairs

    pairs = [
        (1, 2, 0.9), (1, 3, 0.8), (2, 3, 0.7), (4, 5, 0.6), (4, 6, 0.6),
        (5, 6, 0.5), (7, 8, 0.4), (9, 9, 1.0), (10, 7, 0.41),
    ]
    df = spark.createDataFrame(pairs, "l_id long, r_id long, _sim_score double")
    got = {(r.l_id, r.r_id): r._sim_score
           for r in mutual_best_pairs(df).collect()}
    assert got == _brute_mutual(pairs)
    # sanity on the fixture itself: (1,2) mutual; 4's tie broken to 5
    assert (1, 2) in got and (4, 5) in got and (4, 6) not in got


def test_mutual_best_orientation_invariance(spark):
    from sparksimjoin.ranking import mutual_best_pairs

    pairs = [(2, 1, 0.9), (3, 1, 0.8), (3, 2, 0.7)]
    df = spark.createDataFrame(pairs, "l_id long, r_id long, _sim_score double")
    got = {(r.l_id, r.r_id) for r in mutual_best_pairs(df).collect()}
    assert got == {(1, 2)}  # canonical l < r output


def test_mutual_best_disjoint_and_string_ids(spark):
    from sparksimjoin.ranking import mutual_best_pairs

    pairs = [("a", "b", 1.0), ("c", "d", 0.9), ("b", "c", 0.95)]
    df = spark.createDataFrame(pairs, "l_id string, r_id string, _sim_score double")
    got = {(r.l_id, r.r_id) for r in mutual_best_pairs(df).collect()}
    # a-b is mutual; c's best is b (taken? no "taken" semantics — single
    # round mutual-best, so c-d survives only if d's best is c AND c's
    # best is d; c's best is b -> c-d dropped)
    assert got == {("a", "b")}


def test_mutual_best_partition_invariance(spark):
    import random

    from sparksimjoin.ranking import mutual_best_pairs

    rng = random.Random(7)
    pairs = []
    seen = set()
    while len(pairs) < 200:
        l, r = rng.randrange(40), rng.randrange(40)
        if l == r:
            continue
        k = (min(l, r), max(l, r))
        if k in seen:
            continue
        seen.add(k)
        pairs.append((l, r, round(rng.random(), 3)))
    df = spark.createDataFrame(pairs, "l_id long, r_id long, _sim_score double")
    a = {(r.l_id, r.r_id) for r in mutual_best_pairs(df).collect()}
    b = {(r.l_id, r.r_id)
         for r in mutual_best_pairs(df.repartition(13)).collect()}
    assert a == b == set(_brute_mutual(pairs))


def test_mutual_best_validation(spark):
    from sparksimjoin.ranking import mutual_best_pairs

    df = spark.createDataFrame([(1, 2, 0.5)], "l_id long, r_id long, s double")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        mutual_best_pairs(df)


def test_mutual_best_duplicate_orientations_collapse(spark):
    """Both orientations of the same unordered pair in the input
    (asymmetric scorer run twice) used to emit the pair TWICE with
    inconsistent scores; duplicates now collapse to the best score
    before selection."""
    from sparksimjoin.ranking import mutual_best_pairs

    pairs = [(1, 2, 0.9), (2, 1, 0.8), (1, 3, 0.5)]
    df = spark.createDataFrame(pairs, "l_id long, r_id long, _sim_score double")
    got = [(r.l_id, r.r_id, r._sim_score) for r in mutual_best_pairs(df).collect()]
    assert got == [(1, 2, 0.9)]  # once, at the max score
