"""Meta-blocking: graph-based comparison cleaning over token
blocking (Papadakis, Koutrika, Palpanas & Nejdl, TKDE 2014; beyond
the reference surface — the standard ER technique for taming dirty /
schema-free blocking at scale).

Token blocking puts two records in the same block for every token
they share; its candidate set is high-recall but wildly redundant.
Meta-blocking re-views the block collection as a weighted *blocking
graph* — nodes = records, one edge per co-blocked pair, weight =
co-occurrence evidence — and prunes low-weight edges, trading a tiny
recall loss for order-of-magnitude fewer comparisons.

Weight schemes (``scheme=``):

- ``'cbs'`` — Common Blocks Scheme: number of blocks the pair
  shares (integer).
- ``'js'``  — Jaccard Scheme: ``cbs / (|B_l| + |B_r| - cbs)`` over
  the records' retained-block counts.

Pruning (``prune=``, threshold scaled by ``factor``):

- ``'wep'`` — Weight Edge Pruning: keep edges whose weight is >= the
  global mean edge weight.
- ``'wnp'`` — Weighted Node-neighborhood Pruning: keep edges whose
  weight is >= the mean weight of EITHER endpoint's incident edges
  (the redefined/union WNP of the paper — each node nominates its
  strong edges and a nomination by one endpoint suffices).
- ``None``  — no pruning (returns the full weighted graph).

Determinism contract (what makes the DuckDB oracle hash-exact): CBS
weights, their sums, and node degrees are integers, so every pruning
comparison is done in exact arithmetic (``w * n >= factor * sum`` —
each side one IEEE multiplication of exactly-representable bigints,
no float summation anywhere). The JS weight itself is a single IEEE
division — bit-identical across engines — but a JS *mean* would be
an order-dependent double sum, so ``scheme='js'`` pruning thresholds
are computed on the CBS integers (the JS weight is a monotone
per-pair rescaling used for reporting/ranking, while pruning
stays exact). ``prune_on='js'`` opts into true JS-mean pruning for
single-engine use (pytest-covered; not oracle-safe).

100 TB design: block purging (``max_block_size``) IS the skew
control — a token whose posting list exceeds the cap is dropped
before the self-join, so no hot key ever reaches the shuffle and
per-token work is bounded by C(cap, 2); the purge count is surfaced
via ``metrics_out`` (no silent caps). Everything is exploded
equi-joins + map-side-combinable aggregations; no windows, no UDFs,
no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import track
from .tokenizers import Tokenizer, WhitespaceTokenizer
from .validation import validate_attr

SCHEMES = ("cbs", "js")
PRUNES = ("wep", "wnp", None)


def blocking_graph(
    df: DataFrame,
    key_attr: str,
    attr: str,
    tokenizer: Tokenizer | None = None,
    max_block_size: int = 1000,
    metrics_out: dict | None = None,
) -> DataFrame:
    """The weighted blocking graph of a token-blocked table:
    ``(l_id, r_id, cbs, bl, br, js)`` with ``l_id < r_id`` (canonical
    orientation; ids compared in the key's native type ordering).

    Blocks (tokens) with fewer than 2 or more than ``max_block_size``
    records are discarded (purging); ``bl``/``br`` count each
    record's RETAINED blocks, as the paper's schemes do.
    """
    validate_attr(df, key_attr, "table")
    validate_attr(df, attr, "table")
    if max_block_size < 2:
        raise ValueError(f"max_block_size must be >= 2; got {max_block_size}")
    tok = tokenizer or WhitespaceTokenizer(return_set=True)

    post = df.where(F.col(attr).isNotNull()).select(
        F.col(key_attr).alias("id"),
        F.explode(F.array_distinct(tok.spark_expr(F.col(attr)))).alias("token"),
    )
    dfreq = post.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    kept_tokens = dfreq.where(
        (F.col("df") >= 2) & (F.col("df") <= max_block_size)
    ).select("token")
    if metrics_out is not None:
        from .joins.core import LazyCountMetric

        metrics_out["purged_blocks"] = LazyCountMetric(
            dfreq.where(F.col("df") > max_block_size)
        )
    # NO broadcast hint: kept_tokens is vocabulary-sized (every token
    # with 2 <= df <= max_block_size — at corpus scale, most of the
    # vocabulary), far beyond any safe driver broadcast. Plain equi-
    # join; AQE may still choose a broadcast when the actual size is
    # small, which is the right place for that decision.
    kept = track(post.join(kept_tokens, "token"))

    nblocks = kept.groupBy("id").agg(F.count(F.lit(1)).alias("nb"))
    edges = (
        kept.alias("a")
        .join(kept.alias("b"), "token")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("l_id"), F.col("b.id").alias("r_id"))
        .agg(F.count(F.lit(1)).alias("cbs"))
    )
    return (
        edges.join(nblocks.withColumnRenamed("id", "l_id"), "l_id")
        .withColumnRenamed("nb", "bl")
        .join(nblocks.withColumnRenamed("id", "r_id"), "r_id")
        .withColumnRenamed("nb", "br")
        .select(
            "l_id", "r_id", "cbs", "bl", "br",
            (F.col("cbs").cast("double")
             / (F.col("bl") + F.col("br") - F.col("cbs"))).alias("js"),
        )
    )


def meta_block(
    df: DataFrame,
    key_attr: str,
    attr: str,
    tokenizer: Tokenizer | None = None,
    *,
    scheme: str = "cbs",
    prune: str | None = "wep",
    factor: float = 1.0,
    prune_on: str = "cbs",
    max_block_size: int = 1000,
    metrics_out: dict | None = None,
) -> DataFrame:
    """Token blocking + graph pruning. Returns the surviving edges
    ``(l_id, r_id, cbs, js, weight)`` where ``weight`` is the
    requested scheme's value. See the module docstring for scheme /
    prune semantics and the exact-arithmetic determinism contract
    (``prune_on='cbs'``, the default, keeps every pruning comparison
    in integers)."""
    if scheme not in SCHEMES:
        raise ValueError(f"scheme must be one of {SCHEMES}; got {scheme!r}")
    if prune not in PRUNES:
        raise ValueError(f"prune must be one of {PRUNES}; got {prune!r}")
    if prune_on not in SCHEMES:
        raise ValueError(f"prune_on must be one of {SCHEMES}; got {prune_on!r}")
    if factor <= 0:
        raise ValueError(f"factor must be positive; got {factor}")

    g = blocking_graph(
        df, key_attr, attr, tokenizer,
        max_block_size=max_block_size, metrics_out=metrics_out,
    )
    w = F.col("cbs").cast("double") if prune_on == "cbs" else F.col("js")
    out_cols = ["l_id", "r_id", "cbs", "js"]
    weight = (F.col("cbs").cast("double") if scheme == "cbs"
              else F.col("js")).alias("weight")

    if prune is None:
        return g.select(*out_cols, weight)

    g = track(g.withColumn("_w", w))
    if prune == "wep":
        stats = g.agg(
            F.sum("_w").alias("_sw"), F.count(F.lit(1)).alias("_n")
        )
        pruned = g.join(F.broadcast(stats)).where(
            F.col("_w") * F.col("_n") >= F.lit(factor) * F.col("_sw")
        )
        return pruned.select(*out_cols, weight)

    # wnp: per-node mean over incident edges; keep if either endpoint
    # nominates the edge (union/redefined WNP)
    incident = g.select(F.col("l_id").alias("node"), "_w").unionByName(
        g.select(F.col("r_id").alias("node"), "_w")
    )
    nstats = incident.groupBy("node").agg(
        F.sum("_w").alias("_sw"), F.count(F.lit(1)).alias("_deg")
    )
    pruned = (
        g.join(
            nstats.select(F.col("node").alias("l_id"),
                          F.col("_sw").alias("_swl"), F.col("_deg").alias("_dl")),
            "l_id",
        )
        .join(
            nstats.select(F.col("node").alias("r_id"),
                          F.col("_sw").alias("_swr"), F.col("_deg").alias("_dr")),
            "r_id",
        )
        .where(
            (F.col("_w") * F.col("_dl") >= F.lit(factor) * F.col("_swl"))
            | (F.col("_w") * F.col("_dr") >= F.lit(factor) * F.col("_swr"))
        )
    )
    return pruned.select(*out_cols, weight)
