"""Per-record top-k match ranking over scored candidate pairs.

A record-linkage extra beyond the reference surface (the upstream
package returns the full thresholded pair set; SURVEY.md §2 extras):
real ER pipelines cap each record's match list before human review or
clustering — "give me the k best candidate matches per record, with a
deterministic tie-break".

Scale notes (100 TB):
- ``topk_pairs`` is ONE keyed shuffle: ``row_number`` over a window
  partitioned by the record id. Key cardinality is the record count
  (millions+), so the shuffle is well-spread by construction; per-key
  sort depth is each record's candidate count, already bounded by the
  upstream filter-verify pruning. No global sort, no driver collect.
- Ties are broken deterministically (score DESC, then partner id ASC)
  so the output is stable across partitionings and re-runs — required
  for the byte-identical checkpoint/resume contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_pairs(
    scored: DataFrame,
    k: int,
    id_col: str = "l_id",
    partner_col: str = "r_id",
    score_col: str = "_sim_score",
    rank_out: str = "rank",
) -> DataFrame:
    """Keep each ``id_col`` record's ``k`` best-scoring pairs.

    Deterministic ordering: ``score_col`` descending, ``partner_col``
    ascending on ties. Adds ``rank_out`` (1-based dense position by
    ``row_number`` — exactly k rows survive per record even when
    scores tie).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    for c in (id_col, partner_col, score_col):
        if c not in scored.columns:
            raise ValueError(f"column {c!r} not in scored pairs {scored.columns}")
    w = Window.partitionBy(id_col).orderBy(
        F.col(score_col).desc(), F.col(partner_col).asc()
    )
    return (
        scored.withColumn(rank_out, F.row_number().over(w))
        .filter(F.col(rank_out) <= k)
    )


def mutual_best_pairs(
    scored: DataFrame,
    l_col: str = "l_id",
    r_col: str = "r_id",
    score_col: str = "_sim_score",
) -> DataFrame:
    """One-to-one match selection: keep an unordered pair iff each
    record is the other's single best-scoring partner (symmetric best
    match / mutual nearest neighbor — the standard greedy-free way to
    turn a scored candidate set into a 1:1 linkage; by the stable-
    marriage argument every mutual-best pair is in ANY optimal greedy
    matching, so this is its deterministic, order-free core).

    Input: scored pairs, each unordered pair at most once (either
    orientation). Self-pairs are dropped. "Best" breaks score ties by
    partner id ascending, so the result is stable across
    partitionings. Output: ``(l_id, r_id, score_col)`` with
    ``l_id < r_id``.

    Scale: the argmax per record is a ``groupBy(node).min(struct)``
    — map-side combinable, NO window sort, so a celebrity record
    with millions of candidates is one pre-combined reduce key; the
    two confirming joins are equi-joins on the record id. No window,
    no UDF, no driver collect.
    """
    for c in (l_col, r_col, score_col):
        if c not in scored.columns:
            raise ValueError(f"column {c!r} not in scored pairs {scored.columns}")
    canon = (
        scored.where(F.col(l_col) != F.col(r_col))
        .select(
            F.least(l_col, r_col).alias("_l"),
            F.greatest(l_col, r_col).alias("_r"),
            F.col(score_col).alias("_s"),
        )
        # collapse duplicate orientations/rows to the best score —
        # without this, (1,2,0.9) and (2,1,0.8) both satisfy the
        # mutual-best predicate and the output would contain the pair
        # TWICE with inconsistent scores, breaking the 1:1 contract.
        # Map-side combinable; on already-unique input it is a no-op.
        .groupBy("_l", "_r")
        .agg(F.max("_s").alias("_s"))
    )
    sym = canon.select(F.col("_l").alias("node"), F.col("_r").alias("partner"), "_s").unionByName(
        canon.select(F.col("_r").alias("node"), F.col("_l").alias("partner"), "_s")
    )
    best = (
        sym.groupBy("node")
        .agg(F.min(F.struct((-F.col("_s")).alias("ns"), F.col("partner").alias("p"))).alias("b"))
        .select("node", F.col("b.p").alias("best"))
    )
    return (
        canon.join(best.withColumnRenamed("node", "_l").withColumnRenamed("best", "_bl"), "_l")
        .where(F.col("_bl") == F.col("_r"))
        .join(best.withColumnRenamed("node", "_r").withColumnRenamed("best", "_br"), "_r")
        .where(F.col("_br") == F.col("_l"))
        .select(F.col("_l").alias(l_col), F.col("_r").alias(r_col),
                F.col("_s").alias(score_col))
    )
