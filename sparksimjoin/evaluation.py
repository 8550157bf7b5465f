"""Distributed linkage-quality evaluation.

Record-linkage extras beyond the reference surface (SURVEY.md §2
extras): once a pipeline emits predicted pairs or entity clusters,
you need precision/recall/pairwise-F1 against gold labels — at the
same scale as the linkage itself, so the evaluation must not
materialize O(n^2) pairs or collect to the driver.

Two evaluators:

- ``pair_metrics``: predicted pair set vs gold pair set. Pairs are
  canonicalized (least, greatest) and deduplicated, then matched with
  one full-outer equi-join on the pair key. One shuffle on the pair
  key; counts via a single aggregate.

- ``clustering_pairwise_metrics``: pairwise precision/recall/F1
  between two CLUSTERINGS without materializing any pairs — the
  contingency-table identity: for cluster-size vectors {a_i} (pred),
  {b_j} (gold) and cell counts {n_ij} over the shared id universe,
      TP        = sum_ij C(n_ij, 2)
      pred pairs = sum_i C(a_i, 2),   gold pairs = sum_j C(b_j, 2).
  Cost is two keyed aggregations over |V| assignment rows — this is
  what makes pairwise-F1 computable at 10^12 records where the pair
  sets themselves (quadratic in cluster sizes) never could be.

Metric floats are single IEEE divisions on exact BIGINT counts, so
they reproduce bit-identically in any engine that evaluates the same
expression (the DuckDB oracle does) — no tolerance games.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_pairs(df: DataFrame, l_col: str, r_col: str) -> DataFrame:
    """Canonical undirected pair key: (least, greatest), self-pairs
    dropped, duplicates collapsed."""
    a, b = F.col(l_col), F.col(r_col)
    return (
        df.select(
            F.least(a, b).alias("__a"), F.greatest(a, b).alias("__b")
        )
        .filter(F.col("__a") != F.col("__b"))
        .distinct()
    )


def _finish(metrics: DataFrame) -> DataFrame:
    """Derive precision/recall/f1 from tp/pred_pairs/gold_pairs."""
    tp = F.col("tp_pairs").cast("double")
    p = F.when(F.col("pred_pairs") > 0, tp / F.col("pred_pairs")).otherwise(
        F.lit(0.0)
    )
    r = F.when(F.col("gold_pairs") > 0, tp / F.col("gold_pairs")).otherwise(
        F.lit(0.0)
    )
    return metrics.select(
        "*",
        p.alias("precision"),
        r.alias("recall"),
        F.when(
            (F.col("pred_pairs") > 0) & (F.col("gold_pairs") > 0)
            & (F.col("tp_pairs") > 0),
            2.0 * p * r / (p + r),
        ).otherwise(F.lit(0.0)).alias("f1"),
    )


def pair_metrics(
    pred: DataFrame,
    gold: DataFrame,
    l_col: str = "l_id",
    r_col: str = "r_id",
) -> DataFrame:
    """One-row DataFrame: tp/fp/fn pair counts + precision/recall/f1.

    Both inputs are canonicalized and deduplicated first, so directed
    duplicates ((a,b) and (b,a)) and self-pairs never distort counts.
    """
    p = _canon_pairs(pred, l_col, r_col).withColumn("__p", F.lit(1))
    g = _canon_pairs(gold, l_col, r_col).withColumn("__g", F.lit(1))
    joined = p.join(g, ["__a", "__b"], "full_outer")
    counts = joined.agg(
        F.count(F.when(F.col("__p").isNotNull() & F.col("__g").isNotNull(), 1))
        .cast("long").alias("tp_pairs"),
        F.count(F.when(F.col("__p").isNotNull() & F.col("__g").isNull(), 1))
        .cast("long").alias("fp_pairs"),
        F.count(F.when(F.col("__p").isNull() & F.col("__g").isNotNull(), 1))
        .cast("long").alias("fn_pairs"),
    )
    counts = counts.select(
        "tp_pairs", "fp_pairs", "fn_pairs",
        (F.col("tp_pairs") + F.col("fp_pairs")).alias("pred_pairs"),
        (F.col("tp_pairs") + F.col("fn_pairs")).alias("gold_pairs"),
    )
    return _finish(counts)


def clustering_pairwise_metrics(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    pred_cluster_col: str = "cluster_id",
    gold_cluster_col: str = "cluster_id",
) -> DataFrame:
    """Pairwise P/R/F1 between two clusterings via the contingency
    table — no pair materialization (module docstring).

    The id universe is the INNER join of the two assignments (an id
    must be labeled in both to contribute); duplicate assignment rows
    per id are rejected implicitly by counting — callers must pass one
    row per id (the pipeline's clusters output satisfies this).
    Returns one row: n_ids, pred_pairs, gold_pairs, tp_pairs,
    precision, recall, f1.
    """
    pa = pred.select(
        F.col(id_col).alias("__id"), F.col(pred_cluster_col).alias("__pc")
    )
    ga = gold.select(
        F.col(id_col).alias("__id"), F.col(gold_cluster_col).alias("__gc")
    )
    both = pa.join(ga, "__id", "inner")

    def c2(col):
        # C(n, 2) in pure bigint arithmetic: n*(n-1) is even, so the
        # shift is exact. A double-typed /2 would silently lose
        # precision past 2^53 — reachable pair counts at 10^12 rows.
        return F.shiftright(col * (col - F.lit(1)), 1)

    # one keyed aggregation over |V| rows; everything below reads the
    # tiny cell frame (cluster sizes are its marginals), and Spark's
    # ReuseExchange dedupes the shared groupBy(__pc,__gc) shuffle
    # across the branches
    cells = both.groupBy("__pc", "__gc").agg(F.count("*").alias("n"))
    tp = cells.agg(
        F.sum(c2(F.col("n"))).alias("tp_pairs"),
        F.sum("n").cast("long").alias("n_ids"),
    )
    pred_sz = cells.groupBy("__pc").agg(F.sum("n").alias("n")).agg(
        F.sum(c2(F.col("n"))).alias("pred_pairs")
    )
    gold_sz = cells.groupBy("__gc").agg(F.sum("n").alias("n")).agg(
        F.sum(c2(F.col("n"))).alias("gold_pairs")
    )
    one = tp.crossJoin(pred_sz).crossJoin(gold_sz)
    one = one.select(
        F.coalesce("n_ids", F.lit(0)).alias("n_ids"),
        F.coalesce("pred_pairs", F.lit(0)).alias("pred_pairs"),
        F.coalesce("gold_pairs", F.lit(0)).alias("gold_pairs"),
        F.coalesce("tp_pairs", F.lit(0)).alias("tp_pairs"),
    )
    return _finish(one)
