"""Transitive clustering: iterative connected components over the
above-threshold pair edges (north_rule, BASELINE.json:14 — NOT in the
reference; greenfield per SURVEY.md §2.4).

Algorithm: alternating large-star / small-star (Kiveris et al., SoCC
2014) expressed as plain DataFrame ops — each round is two
groupBy-min exchanges; converges in O(log n) rounds on any graph.
Optionally checkpoints each round (truncates lineage — mandatory for
iterative DataFrame algorithms) and emits per-round convergence
counters.

No GraphX/GraphFrames (Python-native requirement); no RDDs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import track


@dataclass
class CCStats:
    rounds: int = 0
    round_changes: list[int] = field(default_factory=list)


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u, connect every strictly-larger neighbor v to
    min(N(u) ∪ {u}). Returns new edge set."""
    nbrs = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    m = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.withColumn("mn", F.least(F.col("mn"), F.col("u")))
    return (
        nbrs.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u, connect all neighbors <= u (and u) to the
    minimum among them. Operates on edges oriented high->low."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).where(F.col("src") != F.col("dst"))
    m = oriented.groupBy("u").agg(F.min("v").alias("mn"))
    return (
        oriented.join(m, "u")
        .select(F.col("v").alias("src"), F.col("mn").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .unionAll(m.select(F.col("u").alias("src"), F.col("mn").alias("dst")))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "l_id",
    dst: str = "r_id",
    max_rounds: int = 50,
    round_checkpoint=None,
    stats: CCStats | None = None,
) -> DataFrame:
    """-> DataFrame(id, component) where component is the minimum
    member id of the node's connected component. Nodes appearing only
    in self-loops / singleton edges map to themselves.

    Each round truncates lineage via ``localCheckpoint`` or, when
    ``round_checkpoint(df, round_idx) -> df`` is supplied (the
    pipeline's parquet/Iceberg checkpointer), through durable storage
    — that is the resume point for mid-run recovery. Convergence =
    the star-contraction reaches a fixpoint.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    nodes = track(
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    e = e.where(F.col("src") != F.col("dst"))

    def _ckpt(df: DataFrame, rnd: int) -> DataFrame:
        if round_checkpoint is not None:
            return round_checkpoint(df, rnd)
        return df.localCheckpoint(eager=True)

    def _sig(df: DataFrame) -> tuple:
        # order-insensitive multiset signature: (count, sum of row
        # hashes) — one cheap agg instead of two exceptAll shuffles
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    e = _ckpt(e, -1)
    prev_sig = _sig(e)
    for rnd in range(max_rounds):
        e1 = _large_star(e).localCheckpoint(eager=True)
        e2 = _ckpt(_small_star(e1), rnd)
        # convergence: the star-contracted edge set is a fixpoint
        cur_sig = _sig(e2)
        changed = 0 if cur_sig == prev_sig else 1
        prev_sig = cur_sig
        if stats is not None:
            stats.rounds = rnd + 1
            stats.round_changes.append(changed)
        e = e2
        if changed == 0:
            break
    comp = e.groupBy("src").agg(F.min("dst").alias("component")).select(
        F.col("src").alias("id"), "component"
    )
    out = (
        nodes.join(comp, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
    return out
