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
