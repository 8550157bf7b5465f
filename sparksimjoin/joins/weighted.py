"""Weighted (inverse-document-frequency) jaccard similarity join.

An extra beyond the reference surface (SURVEY.md §2 extras): the
upstream package treats every token equally, but real entity
resolution wants rare tokens to count for more than ubiquitous ones
("llc" shared by two company names means little; "zylker" means a
lot). Weighted jaccard over token weights w_t:

    sim(x, y) = W(x ∩ y) / (W(x) + W(y) - W(x ∩ y)),   W(S) = Σ w_t

**Exact-integer weights.** The default weight is
``w_t = (N * scale) DIV df_t`` (N = corpus record count, df_t =
token document frequency, integer division) — a 1/df inverse
document frequency kept in pure BIGINT arithmetic, so every
intermediate (per-record total weight, pairwise overlap weight) is
exact, and the ONLY float in the plan is the final one-division
similarity. That makes results bit-reproducible across engines (the
DuckDB oracle replicates the integers and lands on the identical
doubles); a log-idf variant would hinge on ln() being bit-identical
between java.lang.Math and libm, which is not guaranteed.

Filter-verify plan, same shape as joins/core.py:

1. token ranks (joins/core.build_token_ranks): exact global df + the
   dense int tid in (df asc, token asc) order. Because w_t is
   monotone non-increasing in df, ascending tid IS descending-weight
   order with a deterministic tie-break — the sorted tid array doubles
   as the weighted prefix order.
2. weighted prefix (sound): with tokens in global order and cum_{i-1}
   the weight before position i, a pair sharing no token in
   positions 1..p of x has overlap ≤ W(x) - cum_p < t·W(x), and since
   W(y) ≥ overlap, sim ≤ overlap/W(x) < t. So the prefix keeps
   positions with cum_{i-1} ≤ (1-t)·W(x) (+ a small float-guard
   epsilon — widening the prefix only adds candidates, never loses
   pairs). Computed as a pure array aggregate — no per-record window.
3. candidates: exploded prefix equi-join on int tid, hot tokens split
   by the shared mandatory salt (joins/core.build_salt_map — the same
   100 TB skew defense as the unweighted joins), plus the weight band
   W(y) ∈ [t·W(x), W(x)/t] (sim ≤ min(W)/max(W)), epsilon-widened.
4. verify: JVM `array_intersect` on the int tid arrays (primitive
   fast path) with weights looked up from a per-record map — exact
   BIGINT overlap weight, one double division, threshold compare.

No Python UDFs, no driver collect; the one count() materializing N
also gates empty inputs early (same pattern as the unweighted joins'
stats probes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import track
from ..tokenizers import Tokenizer
from ..validation import validate_join_inputs, validate_threshold
from .core import AUTO_SALT_CAP, apply_salt, build_salt_map, build_token_ranks

#: weight quantization: w = (N * WEIGHT_SCALE) DIV df
WEIGHT_SCALE = 1_000_000


def _tok_side(df: DataFrame, key: str, attr: str, tok: Tokenizer) -> DataFrame:
    return (
        df.where(F.col(attr).isNotNull())
        .select(F.col(key).alias("id"), tok.spark_expr(F.col(attr)).alias("toks"))
        .where(F.size("toks") > 0)
    )


def _rec_frame(tok_df: DataFrame, wtab: DataFrame, threshold: float) -> DataFrame:
    """(id, tids sorted asc = weight desc, ws aligned, wmap, tw,
    prefix) — all array/map ops, no window."""
    rw = tok_df.select("id", F.explode("toks").alias("token")).join(
        wtab.select("token", "tid", "w"), "token"
    )
    rec = rw.groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("tid", "w"))).alias("_tw")
    )
    rec = rec.select(
        "id",
        F.expr("transform(_tw, x -> x.tid)").alias("tids"),
        F.expr("transform(_tw, x -> x.w)").alias("ws"),
    ).select(
        "id", "tids", "ws",
        F.expr("aggregate(ws, CAST(0 AS BIGINT), (a, x) -> a + x)").alias("tw"),
    )
    # prefix length p = #{i : cum_{i-1} <= (1-t)*tw}; epsilon widens
    # (module docstring step 2 — widening is lossless)
    bound = f"(1.0d - {threshold!r}) * CAST(tw AS DOUBLE) + 1e-6"
    p = (
        "aggregate(ws, struct(CAST(0 AS BIGINT) AS s, 0 AS c), "
        "(st, x) -> struct(st.s + x AS s, "
        f"st.c + IF(CAST(st.s AS DOUBLE) <= {bound}, 1, 0) AS c), "
        "st -> st.c)"
    )
    return rec.select(
        "id", "tids", "tw",
        F.map_from_arrays("tids", "ws").alias("wmap"),
        F.expr(f"slice(tids, 1, {p})").alias("prefix"),
    )


def weighted_jaccard_join(
    l_df: DataFrame,
    r_df: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_join_attr: str,
    r_join_attr: str,
    tokenizer: Tokenizer,
    threshold: float,
    *,
    self_join: bool = False,
    salt_cap: int | None = None,
) -> DataFrame:
    """-> (l_id, r_id, _sim_score) pairs with weighted jaccard >=
    ``threshold``. Records with no tokens are skipped (weighted
    jaccard is undefined on empty weight sets — unlike the unweighted
    joins' ``allow_empty``, there is no reference contract to honor
    here). ``self_join`` emits ``l_id < r_id`` only. Document
    frequencies are computed over BOTH inputs for a two-table join
    (one shared weight space) and once for a self-join."""
    validate_join_inputs(l_df, r_df, l_key_attr, r_key_attr, l_join_attr,
                         r_join_attr, None, None)
    validate_threshold(threshold, "JACCARD")
    if salt_cap is not None and salt_cap <= 0:
        raise ValueError(f"salt_cap must be positive (got {salt_cap})")
    tok = tokenizer.with_return_set(True)

    l_tok = _tok_side(l_df, l_key_attr, l_join_attr, tok)
    r_tok = l_tok if self_join else _tok_side(r_df, r_key_attr, r_join_attr, tok)
    corpus = [l_tok] if self_join else [l_tok, r_tok]

    # persisted: ranks feeds the weight table AND the salt map, and
    # the record frame feeds four plan branches (both explode sides +
    # both verify sides) — without the persist the whole
    # rank/weight/prefix subtree re-executes per branch (measured 4x
    # BroadcastNestedLoop repetitions of the N crossJoin in the
    # un-persisted plan). Same cache.track discipline as
    # prepare_sides; callers wrap in scoped_caches for hygiene.
    ranks = track(build_token_ranks(corpus))  # (token, cnt, tid)
    # N via a broadcast 1-row frame: keeps the weight table lazy
    n_df = corpus[0]
    for extra in corpus[1:]:
        n_df = n_df.unionByName(extra)
    n_df = n_df.agg(F.count("*").alias("_n"))
    wtab = ranks.crossJoin(F.broadcast(n_df)).select(
        "token", "tid", "cnt",
        F.expr(f"CAST((_n * {WEIGHT_SCALE}) DIV cnt AS BIGINT)").alias("w"),
    )

    rec_l = track(_rec_frame(l_tok, wtab, threshold))
    rec_r = rec_l if self_join else track(_rec_frame(r_tok, wtab, threshold))

    ex_l = rec_l.select(
        F.col("id").alias("l_id"), F.col("tw").alias("l_tw"),
        F.explode("prefix").alias("token"),
    )
    ex_r = rec_r.select(
        F.col("id").alias("r_id"), F.col("tw").alias("r_tw"),
        F.explode("prefix").alias("token"),
    )
    salt_map = build_salt_map(ranks, salt_cap or AUTO_SALT_CAP, key_col="tid")
    ex_l, ex_r, join_keys = apply_salt(ex_l, ex_r, salt_map)

    eps = 1e-9
    band = (
        (F.col("r_tw").cast("double")
         >= F.lit(threshold) * F.col("l_tw") * (1.0 - eps))
        & (F.col("r_tw").cast("double")
           <= F.col("l_tw") / F.lit(threshold) * (1.0 + eps))
    )
    pair_pred = F.col("l_id") < F.col("r_id") if self_join else F.lit(True)
    cand = (
        ex_l.join(ex_r, join_keys)
        .where(band & pair_pred)
        .select("l_id", "r_id")
        .distinct()
    )

    lv = rec_l.select(
        F.col("id").alias("l_id"), F.col("tids").alias("l_tids"),
        F.col("wmap").alias("l_wmap"), F.col("tw").alias("l_tw"),
    )
    rv = rec_r.select(
        F.col("id").alias("r_id"), F.col("tids").alias("r_tids"),
        F.col("tw").alias("r_tw"),
    )
    verified = (
        cand.join(lv, "l_id")
        .join(rv, "r_id")
        .withColumn(
            "_ow",
            F.expr(
                "aggregate(array_intersect(l_tids, r_tids), "
                "CAST(0 AS BIGINT), (a, t) -> a + l_wmap[t])"
            ),
        )
        .withColumn(
            "_sim_score",
            F.col("_ow").cast("double") / (F.col("l_tw") + F.col("r_tw") - F.col("_ow")),
        )
        .where(F.col("_sim_score") >= threshold)
    )
    return verified.select("l_id", "r_id", "_sim_score")
