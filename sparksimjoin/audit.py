"""Cluster quality audit for record-linkage output.

Transitive clustering's classic failure is the BAD MERGE: two dense
groups bridged by one borderline pair collapse into a single entity,
and nothing in the pipeline output says so. ``cluster_audit`` scores
every emitted component with the evidence that holds it together:

- ``n_records``  — component size
- ``n_edges``    — match edges INSIDE the component (its support)
- ``density``    — n_edges / C(n_records, 2); 1.0 = every pair matched
  directly (clique), values near 2/n = a chain held together purely by
  transitivity — the bad-merge signature. NULL for singletons.
- ``min_sim`` / ``avg_sim`` — the weakest and mean supporting score;
  a low min on a low-density component is the first pair a reviewer
  should look at.

Everything is built-in DataFrame ops (two equi-joins on record id +
one groupBy on component): at 100 TB the joins hash-partition on the
well-distributed record id, aggregation combines map-side, and a
single pathological mega-component is one reduce KEY whose payload
arrives pre-aggregated — no per-row Python anywhere.

Analogue of the reference's output-diagnostics conventions
(profile_table_for_join's report shape); upstream has no cluster-level
equivalent because it stops at pairwise output.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def cluster_audit(
    components: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    component_col: str = "component",
    l_col: str = "l_id",
    r_col: str = "r_id",
    score_col: str = "_sim_score",
    round_to: int | None = 6,
) -> DataFrame:
    """Per-component support statistics.

    ``components``: one row per record, ``(id_col, component_col)`` —
    the clustering output. ``edges``: the pairwise matches that fed it,
    ``(l_col, r_col, score_col)``. Edges whose endpoints landed in
    DIFFERENT components (possible when auditing a foreign edge set)
    are ignored; each undirected edge must appear once, either
    orientation. ``round_to`` rounds ``avg_sim`` so the value is
    reproducible across summation orders (set ``None`` for raw).
    """
    lab = components.select(
        F.col(id_col).alias("__aid"), F.col(component_col).alias("__comp")
    )
    e = (
        edges.select(
            F.col(l_col).alias("__l"),
            F.col(r_col).alias("__r"),
            F.col(score_col).cast("double").alias("__s"),
        )
        .join(lab.withColumnRenamed("__aid", "__l"), "__l")
        .withColumnRenamed("__comp", "__lc")
        .join(lab.withColumnRenamed("__aid", "__r"), "__r")
        .where(F.col("__lc") == F.col("__comp"))
    )
    avg_sim: Column = F.avg("__s")
    if round_to is not None:
        avg_sim = F.round(avg_sim, round_to)
    edge_stats = e.groupBy(F.col("__lc").alias("__comp")).agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.min("__s").alias("min_sim"),
        avg_sim.alias("avg_sim"),
    )
    sizes = lab.groupBy("__comp").agg(F.count(F.lit(1)).alias("n_records"))
    n = F.col("n_records").cast("double")
    return (
        sizes.join(edge_stats, "__comp", "left")
        .select(
            F.col("__comp").alias(component_col),
            "n_records",
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            F.when(
                F.col("n_records") > 1,
                F.coalesce("n_edges", F.lit(0)).cast("double") / (n * (n - 1) / 2),
            ).alias("density"),
            "min_sim",
            "avg_sim",
        )
    )


def cluster_audit_chain(
    spark: SparkSession, workdir: str, checkpoint_format: str = "parquet"
) -> DataFrame:
    """Full-corpus audit from the HEAD of an incremental chain.

    An incremental run's own ``scored`` checkpoint holds only the
    batch's edges (new x new + new x base), so auditing its clusters
    against it alone would understate support. But the chain's scored
    checkpoints PARTITION the full edge set: the root run scored every
    base-internal pair, and each batch scored exactly the pairs that
    involve at least one of its new records — disjoint and together
    complete (the same equivalence that makes incremental clusters ==
    full-recompute clusters, incremental.py module docstring). So this
    walks the ``base`` pointers recorded in each scored manifest,
    unions the chain's scored frames, and audits the head's clusters
    against the complete edge set.
    """
    from .checkpoint import CheckpointManager

    head = CheckpointManager(spark, workdir, fmt=checkpoint_format)
    clusters = head.read("clusters")
    frames: list[DataFrame] = []
    seen: set[str] = set()
    cur = head
    while True:
        frames.append(cur.read("scored").select("l_id", "r_id", "_sim_score"))
        base_root = cur.manifest("scored").get("base")
        if not base_root:
            break
        if base_root in seen:
            raise ValueError(f"cycle in incremental chain at {base_root!r}")
        seen.add(base_root)
        cur = CheckpointManager(spark, base_root, fmt=checkpoint_format)
    edges = reduce(DataFrame.unionByName, frames)
    return cluster_audit(
        clusters, edges, id_col="conv_id", component_col="component"
    )
