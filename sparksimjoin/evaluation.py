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

- ``threshold_sweep`` / ``best_threshold``: threshold calibration.
  Score the candidate set ONCE at the loosest threshold under
  consideration, then evaluate every candidate threshold against a
  gold pair set in a single pass — one full-outer join on the
  canonical pair key plus ONE aggregation emitting all thresholds'
  counts as columns (unpivoted to rows afterwards). No per-threshold
  re-join, no re-scoring: sweeping 20 thresholds costs the same
  shuffle as evaluating one.
"""

from __future__ import annotations

from typing import Sequence

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


def threshold_sweep(
    scored: DataFrame,
    gold: DataFrame,
    thresholds: Sequence[float],
    l_col: str = "l_id",
    r_col: str = "r_id",
    score_col: str = "_sim_score",
    gold_l_col: str | None = None,
    gold_r_col: str | None = None,
    comp_op: str = ">=",
) -> DataFrame:
    """Evaluate every candidate ``threshold`` against ``gold`` in one
    pass over ``scored`` -> DataFrame(threshold, tp_pairs, fp_pairs,
    fn_pairs, pred_pairs, gold_pairs, precision, recall, f1), one row
    per distinct threshold.

    ``scored`` must be the pair set produced at (or below) the
    LOOSEST threshold in the sweep — a pair absent from ``scored`` is
    treated as unpredicted at every threshold, so scoring at a
    tighter cut than ``min(thresholds)`` silently under-reports the
    loose rows. Directed duplicates collapse to the canonical
    undirected pair keeping the BEST score under ``comp_op``'s
    direction (max for >=/>, min for <=/< — edit-distance sweeps cut
    from below).

    Plan shape (100 TB): canonical-pair groupBy + one full-outer join
    with gold + ONE aggregate whose output is 2·T+1 bigint columns
    (T = len(thresholds)), exploded JVM-side to T rows. Adding
    thresholds adds agg columns, never jobs or shuffles.
    """
    from .filter_math import COMP_OP_MAP

    if comp_op not in (">=", ">", "<=", "<"):
        raise ValueError(
            f"comp_op must be an ordering comparison (got {comp_op!r})"
        )
    ts = sorted({float(t) for t in thresholds})
    if not ts:
        raise ValueError("thresholds must be a non-empty sequence")
    gl = gold_l_col if gold_l_col is not None else l_col
    gr = gold_r_col if gold_r_col is not None else r_col
    cmp_fn = COMP_OP_MAP[comp_op]
    # "best" score = the one most likely to pass the cut
    best = F.max if comp_op in (">=", ">") else F.min

    a, b = F.col(l_col), F.col(r_col)
    p = (
        scored.select(
            F.least(a, b).alias("__a"),
            F.greatest(a, b).alias("__b"),
            F.col(score_col).cast("double").alias("__s"),
        )
        .filter(F.col("__a") != F.col("__b"))
        .groupBy("__a", "__b")
        .agg(best("__s").alias("__s"))
    )
    g = _canon_pairs(gold, gl, gr).withColumn("__g", F.lit(1))
    j = p.join(g, ["__a", "__b"], "full_outer")

    # one aggregate, 2 columns per threshold; a NULL __s (gold-only
    # pair) comparison yields NULL -> count() skips it, which is the
    # correct "not predicted" semantics at every threshold
    exprs = []
    for i, t in enumerate(ts):
        hit = cmp_fn(F.col("__s"), F.lit(t))
        exprs.append(F.count(F.when(hit, 1)).cast("long").alias(f"__pred_{i}"))
        exprs.append(
            F.count(F.when(hit & F.col("__g").isNotNull(), 1))
            .cast("long")
            .alias(f"__tp_{i}")
        )
    exprs.append(F.count("__g").cast("long").alias("__gold"))
    one = j.agg(*exprs)

    rows = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("threshold"),
                        F.col(f"__tp_{i}").alias("tp_pairs"),
                        (F.col(f"__pred_{i}") - F.col(f"__tp_{i}")).alias(
                            "fp_pairs"
                        ),
                        (F.col("__gold") - F.col(f"__tp_{i}")).alias(
                            "fn_pairs"
                        ),
                        F.col(f"__pred_{i}").alias("pred_pairs"),
                        F.col("__gold").alias("gold_pairs"),
                    )
                    for i, t in enumerate(ts)
                ]
            ).alias("__r")
        ).alias("__r")
    ).select("__r.*")
    return _finish(rows)


def blocking_metrics(
    candidates: DataFrame,
    gold: DataFrame,
    total_pairs: int,
    l_col: str = "l_id",
    r_col: str = "r_id",
    gold_l_col: str | None = None,
    gold_r_col: str | None = None,
) -> DataFrame:
    """Blocking-quality metrics: one row with ``cand_pairs``,
    ``gold_pairs``, ``tp_pairs``, ``total_pairs``,
    ``pairs_completeness`` (share of gold pairs the blocker kept — the
    blocking-recall number that gates the whole pipeline's recall),
    ``pair_quality`` (share of candidates that are true matches) and
    ``reduction_ratio`` (1 - |C|/total — how much of the quadratic
    comparison space the blocker eliminated).

    ``total_pairs`` is the comparison-space size: ``n_l * n_r`` for a
    two-table blocker, ``C(n, 2)`` for a self-join (callers know their
    record counts; pass exact BIGINT math, e.g.
    ``n * (n - 1) // 2``). Both pair sets are canonicalized (least,
    greatest) and deduplicated; the metric floats are single IEEE
    divisions on exact bigint counts (bit-reproducible cross-engine).
    Cost: one shuffle on the canonical pair key — the same full-outer
    join ``pair_metrics`` does."""
    if total_pairs < 0:
        raise ValueError(f"total_pairs must be >= 0, got {total_pairs}")
    gl = gold_l_col if gold_l_col is not None else l_col
    gr = gold_r_col if gold_r_col is not None else r_col
    c = _canon_pairs(candidates, l_col, r_col).withColumn("__p", F.lit(1))
    g = _canon_pairs(gold, gl, gr).withColumn("__g", F.lit(1))
    joined = c.join(g, ["__a", "__b"], "full_outer")
    counts = joined.agg(
        F.count("__p").cast("long").alias("cand_pairs"),
        F.count("__g").cast("long").alias("gold_pairs"),
        F.count(F.when(F.col("__p").isNotNull() & F.col("__g").isNotNull(), 1))
        .cast("long").alias("tp_pairs"),
    )
    tp = F.col("tp_pairs").cast("double")
    return counts.select(
        "cand_pairs", "gold_pairs", "tp_pairs",
        F.lit(int(total_pairs)).cast("long").alias("total_pairs"),
        F.when(F.col("gold_pairs") > 0, tp / F.col("gold_pairs"))
        .otherwise(F.lit(0.0)).alias("pairs_completeness"),
        F.when(F.col("cand_pairs") > 0, tp / F.col("cand_pairs"))
        .otherwise(F.lit(0.0)).alias("pair_quality"),
        F.when(
            F.lit(int(total_pairs)) > 0,
            F.lit(1.0) - F.col("cand_pairs").cast("double") / F.lit(float(total_pairs)),
        ).otherwise(F.lit(0.0)).alias("reduction_ratio"),
    )


def _bcubed_cells(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str,
    pred_cluster_col: str,
    gold_cluster_col: str,
) -> DataFrame:
    """Shared contingency cells (``__pc``, ``__gc``, ``n``) over the
    INNER-join id universe — same convention as
    :func:`clustering_pairwise_metrics`."""
    pa = pred.select(
        F.col(id_col).alias("__id"), F.col(pred_cluster_col).alias("__pc")
    )
    ga = gold.select(
        F.col(id_col).alias("__id"), F.col(gold_cluster_col).alias("__gc")
    )
    both = pa.join(ga, "__id", "inner")
    return both.groupBy("__pc", "__gc").agg(F.count("*").alias("n"))


def bcubed_contributions(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    pred_cluster_col: str = "cluster_id",
    gold_cluster_col: str = "cluster_id",
) -> DataFrame:
    """Per-cluster B-cubed contribution table (Bagga & Baldwin 1998;
    the element-centric clustering metric that, unlike pairwise F1,
    does not let one mega-cluster dominate the score).

    For element e, BCubed precision(e) = |C(e) ∩ L(e)| / |C(e)| and
    recall(e) mirrors it on the gold side. Grouping elements by their
    predicted cluster i (sizes a_i, cells n_ij):

        sum_{e in i} precision(e) = sum_j n_ij^2 / a_i

    so each predicted cluster contributes ONE row with exact-integer
    ``sum_nij_sq`` / ``n_members`` and a single IEEE division — and
    symmetrically each gold cluster for recall. Global BCubed
    precision = sum(precision-side contribution) / N.

    Output: ``(side, cluster_id, n_members, sum_nij_sq,
    contribution)`` with side ∈ {'precision', 'recall'} and
    cluster_id cast to string so the two sides union cleanly. Every
    value is either exact bigint or one division on exact bigints —
    bit-reproducible cross-engine (the ``bcubed_doc`` oracle
    replicates it in SQL), which is why the per-cluster table, not
    the order-dependent float SUM over it, is the oracle surface.

    Scale: one groupBy over |V| assignment rows for the cells, two
    map-side-combinable groupBys over the (≤ |V|-row) cell frame —
    the same shape as :func:`clustering_pairwise_metrics`; no pair
    materialization, no window, no driver collect.
    """
    cells = _bcubed_cells(pred, gold, id_col, pred_cluster_col,
                          gold_cluster_col)

    def side(key: str, label: str) -> DataFrame:
        g = cells.groupBy(key).agg(
            F.sum("n").cast("long").alias("n_members"),
            F.sum(F.col("n") * F.col("n")).cast("long").alias("sum_nij_sq"),
        )
        return g.select(
            F.lit(label).alias("side"),
            F.col(key).cast("string").alias("cluster_id"),
            "n_members",
            "sum_nij_sq",
            (F.col("sum_nij_sq").cast("double") / F.col("n_members").cast("double"))
            .alias("contribution"),
        )

    return side("__pc", "precision").unionAll(side("__gc", "recall"))


def bcubed_metrics(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    pred_cluster_col: str = "cluster_id",
    gold_cluster_col: str = "cluster_id",
) -> DataFrame:
    """One-row BCubed summary: ``(n_ids, bcubed_precision,
    bcubed_recall, bcubed_f1)`` — the global averages over
    :func:`bcubed_contributions` (precision = Σ contribution / N).

    The final sums are double-typed and therefore summation-order
    dependent at the ~1 ulp level (unlike the per-cluster table,
    which is bit-exact — use it when cross-engine reproducibility
    matters); the F1 is the harmonic mean. Cost: same two keyed
    aggregations as the contribution table plus one global agg.
    """
    cells = _bcubed_cells(pred, gold, id_col, pred_cluster_col,
                          gold_cluster_col)

    def side_sum(key: str) -> DataFrame:
        return (
            cells.groupBy(key)
            .agg(
                F.sum("n").cast("long").alias("__n"),
                F.sum(F.col("n") * F.col("n")).cast("long").alias("__sq"),
            )
            .agg(
                F.sum(F.col("__sq").cast("double") / F.col("__n").cast("double"))
                .alias("__s"),
                F.sum("__n").cast("long").alias("__tot"),
            )
        )

    p = side_sum("__pc").select(
        F.col("__s").alias("__ps"), F.col("__tot").alias("n_ids")
    )
    r = side_sum("__gc").select(F.col("__s").alias("__rs"))
    one = p.crossJoin(r)
    n = F.col("n_ids").cast("double")
    prec = F.when(F.col("n_ids") > 0, F.col("__ps") / n).otherwise(F.lit(0.0))
    rec = F.when(F.col("n_ids") > 0, F.col("__rs") / n).otherwise(F.lit(0.0))
    return one.select(
        F.coalesce("n_ids", F.lit(0)).alias("n_ids"),
        prec.alias("bcubed_precision"),
        rec.alias("bcubed_recall"),
        F.when(
            (prec + rec) > 0, 2.0 * prec * rec / (prec + rec)
        ).otherwise(F.lit(0.0)).alias("bcubed_f1"),
    )


def best_threshold(sweep: DataFrame) -> float:
    """Pick the F1-maximizing threshold from a ``threshold_sweep``
    result (ties -> smallest threshold). The sweep
    frame is one row per threshold, so the collect is a metrics probe
    on a tiny frame, not a data-path collect."""
    rows = sweep.select("threshold", "f1").collect()
    if not rows:
        raise ValueError("empty sweep — no thresholds to choose from")
    return float(max(rows, key=lambda r: (r["f1"], -r["threshold"]))["threshold"])
