"""Tversky-index join: the parameterized asymmetric set measure

    T_{a,b}(x, y) = o / (o + alpha*(|x|-o) + beta*(|y|-o))

(Tversky 1977; py_stringmatching's ``TverskyIndex`` — the upstream
reference reaches it only through ``apply_matcher(sim_function=
TverskyIndex(...).get_raw_score)``; here it is a first-class blocked
join). alpha=beta=0.5 is Dice, alpha=beta=1 is Jaccard; asymmetric
weights (alpha != beta) penalize the two sides' residual tokens
differently — the classic use is matching short queries against long
records without the long side's extra tokens drowning the score.

Blocking is SOUND and reuses the whole DICE filter stack: with
c = min(alpha, beta), tversky >= t implies dice >= t' with
t' = 2tc/(1-t+2tc) (derivation + tightness note in
filter_math.tversky_dice_block_threshold), so prefix/size/position/
salt machinery runs unchanged at threshold t' and only the verify
expression differs (filter_math.tversky_expr, pure Column — JVM-side,
no UDF). Tight when alpha == beta; for strongly asymmetric weights the
candidate set is looser but never lossy (brute-force parity in
tests/test_tversky.py covers alpha 4x beta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .. import filter_math as fm
from ..tokenizers import Tokenizer
from .set_sim import set_sim_join


def tversky_index_join(
    l_df: DataFrame,
    r_df: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_join_attr: str,
    r_join_attr: str,
    tokenizer: Tokenizer,
    threshold: float,
    alpha: float = 0.5,
    beta: float = 0.5,
    comp_op: str = ">=",
    allow_empty: bool = True,
    allow_missing: bool = False,
    l_out_attrs: list[str] | None = None,
    r_out_attrs: list[str] | None = None,
    l_out_prefix: str = "l_",
    r_out_prefix: str = "r_",
    out_sim_score: bool = True,
    n_jobs: int = 1,
    show_progress: bool = False,
    **spark_opts,
) -> DataFrame:
    """Filter-verify Tversky join. Signature mirrors the reference's
    set-sim joins plus (alpha, beta); Spark extras (self_join,
    salt_cap, dense_id, dedup_strings, ...) pass through set_sim_join.

    alpha and beta must be > 0: a zero coefficient makes one side's
    residual free and no record-local prefix bound exists (the same
    degeneracy as OVERLAP_COEFFICIENT) — use apply_matcher with a
    callable over a custom candset for that case.
    """
    assert 0 < threshold <= 1, f"TVERSKY threshold must be in (0, 1], got {threshold}"
    # raises on alpha/beta <= 0 with the degeneracy explanation
    t_block = fm.tversky_dice_block_threshold(threshold, alpha, beta)
    if alpha != beta and spark_opts.get("self_join"):
        # ASYMMETRIC self-join semantics: the lesser id is the left
        # argument (the brute-force oracle's convention), so (a) the
        # verify stage must score on the canonical orientation
        # (_verify_orient below) and (b) the exact-duplicate dedup
        # pre-pass must be OFF — it scores once per token-set GROUP
        # pair and replays that score onto record pairs whose
        # canonical orientation can be either way round. Symmetric
        # weights keep both optimizations.
        spark_opts["dedup_strings"] = False
    return set_sim_join(
        l_df, r_df, l_key_attr, r_key_attr, l_join_attr, r_join_attr,
        tokenizer, t_block, fm.DICE, comp_op, allow_empty, allow_missing,
        l_out_attrs, r_out_attrs, l_out_prefix, r_out_prefix, out_sim_score,
        n_jobs, show_progress,
        _verify_score_fn=lambda lt, rt: fm.tversky_expr(lt, rt, alpha, beta),
        _verify_threshold=float(threshold),
        _verify_orient=(alpha != beta),
        **spark_opts,
    )
