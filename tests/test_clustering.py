from __future__ import annotations

import pytest

from sparksimjoin.clustering import CCStats, connected_components
from sparksimjoin.fixtures import make_edge_fixtures
from sparksimjoin.naive import naive_connected_components

FIXTURES = make_edge_fixtures()


@pytest.mark.parametrize("name", list(FIXTURES))
def test_connected_components(spark, name):
    edges = FIXTURES[name]
    df = spark.createDataFrame(edges, "l_id long, r_id long")
    stats = CCStats()
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, stats=stats).collect()
    }
    expected = naive_connected_components(edges)
    assert got == expected, name
    # large-star/small-star converges in O(log n) rounds
    assert stats.rounds <= 12, (name, stats.rounds)


def test_cc_deep_chain_logarithmic_rounds(spark):
    """Adversarial-depth guard for max_rounds=50: a 10k-node path
    graph (diameter 9999 — naive label propagation would need ~10k
    rounds) must converge in O(log n) star-contraction rounds, far
    under the default cap, with the correct single component."""
    n = 10_000
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "l_id long, r_id long")
    stats = CCStats()
    comp = connected_components(df, stats=stats)
    distinct_components = comp.select("component").distinct().count()
    assert distinct_components == 1
    assert comp.count() == n
    assert stats.rounds <= 20, stats.rounds


def test_cc_round_checkpoints_written(spark, tmp_path):
    """Per-round manifests land via the round_checkpoint hook — the
    mid-run resume points the north rule asks for."""
    from sparksimjoin.checkpoint import CheckpointManager

    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "l_id long, r_id long")
    ckpt = CheckpointManager(spark, str(tmp_path))
    stats = CCStats()

    def round_ckpt(d, rnd):
        return ckpt.write(d, f"cc_round_{rnd}", inputs=["edges"])

    comp = connected_components(df, round_checkpoint=round_ckpt, stats=stats)
    assert comp.select("component").distinct().count() == 1
    names = {m["stage"] for m in ckpt.all_manifests()}
    # one checkpoint per completed round (plus the initial round -1)
    assert f"cc_round_{stats.rounds - 1}" in names
    assert all(f"cc_round_{r}" in names for r in range(stats.rounds))
