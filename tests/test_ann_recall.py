"""Recall floors for the approximate ANN paths (round-5 verdict item:
the 0.63/0.81/0.92 recall ladder lived only in BENCH prose — a
banding/codebook regression would pass every oracle, because the
oracles replicate the ALGORITHM, not its recall). Seeded clustered
corpus, recall@k measured against brute force; floors sit well below
the measured values so host noise cannot flake them, but a broken
band count / codebook (asserted red in the negative test) falls
through."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksimjoin.ann import brute_force_topk, ivf_topk, lsh_topk

N, DIM, K = 4000, 32, 10


@pytest.fixture(scope="module")
def vectors(spark):
    """Clustered unit-ish vectors: 40 centers, 100 members each, with
    small noise — the regime LSH/IVF are built for (planted near
    neighbors inside each cluster)."""
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(40, DIM))
    rows = []
    for i in range(N):
        c = centers[i % 40]
        v = c + 0.15 * rng.normal(size=DIM)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    df.count()
    return df


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx, exact):
    hits = tot = 0
    for q, nb in exact.items():
        tot += len(nb)
        hits += len(nb & approx.get(q, set()))
    return hits / tot


@pytest.fixture(scope="module")
def exact(vectors):
    return _topk_sets(brute_force_topk(vectors, "vec_id", "embedding", k=K))


def test_lsh_recall_floor(vectors, exact):
    approx = _topk_sets(
        lsh_topk(vectors, "vec_id", "embedding", k=K, n_planes=4, n_tables=10)
    )
    r = _recall(approx, exact)
    assert r >= 0.75, f"LSH recall@{K} collapsed to {r:.3f} (floor 0.75)"


def test_ivf_recall_floor(vectors, exact):
    approx = _topk_sets(
        ivf_topk(vectors, "vec_id", "embedding", k=K,
                 n_cells=16, n_probe=4, kmeans_iters=2)
    )
    r = _recall(approx, exact)
    assert r >= 0.85, f"IVF recall@{K} collapsed to {r:.3f} (floor 0.85)"


def test_recall_floor_catches_broken_banding(vectors, exact):
    """Sanity of the floor itself: a deliberately broken configuration
    (one table of many planes -> almost no co-bucketing at this noise
    level) must fall BELOW the LSH floor, proving the gate can go
    red."""
    approx = _topk_sets(
        lsh_topk(vectors, "vec_id", "embedding", k=K, n_planes=24, n_tables=1)
    )
    r = _recall(approx, exact)
    assert r < 0.75, f"broken banding unexpectedly reached recall {r:.3f}"
