"""Soft TF-IDF join (Cohen, Ravikumar & Fienberg 2003 — the hybrid
measure their comparison found strongest for name matching), made a
first-class blocked join.

Upstream users reach soft TF-IDF only through py_stringmatching's
``SoftTfIdf`` callable over a pre-built candset (``[R]
py_stringsimjoin/matcher/apply_matcher.py`` — the extension point);
that callable also needs a corpus list the caller must assemble.
Here the corpus statistics, blocking, and scoring are one DataFrame
plan.

Definition (this module's precise contract — set tokens, tf = 1):

- integer IDF weights ``w_t = (N * SOFT_SCALE) DIV df_t`` over the
  UNION corpus of both tables (shared weight space, exactly
  joins/weighted.py's scheme and for the same reason: pure-BIGINT
  intermediates make results bit-reproducible cross-engine, where a
  log-idf would hinge on ln() parity between java.lang.Math and
  libm);
- per-record L2 norm ``n(x) = sqrt(Σ w_t²)`` (the Σ is exact BIGINT;
  the sqrt is one IEEE-exact double op);
- CLOSE(x, y, θ) = tokens ``a ∈ x`` with ``max_{b∈y} jw(a, b) >= θ``
  (θ defaults to 0.9, Cohen's choice; jw = the exact Jaro-Winkler
  kernel, bit-identical to DuckDB's builtin);
- for each close ``a``: ``mx = max_b jw(a, b)`` and ``w2 = max{w_b :
  jw(a, b) = mx}`` — "closest b, ties by largest weight"; among
  (mx, w2)-equal ties the term is identical, so no further
  tie-break is needed. Computed as ONE aggregate:
  ``max(struct(jw, w_b))`` (struct ordering = lexicographic);
- ``score(x, y) = fsum_a(w1_a * w2 * mx) / (n(x) * n(y))`` —
  asymmetric (close-set over the LEFT tokens; on self-joins the
  canonical lesser-key-left orientation is scored, the
  tversky/monge-elkan convention). Exact summation makes the score
  independent of term order; the only cross-engine wiggle is
  math.fsum (exactly rounded) vs DuckDB fsum (Kahan), absorbed by
  the oracle's round-before-filter.

Blocking is LOSSLESS for any t > 0: every contributing term needs a
token pair with ``jw >= θ``, so candidates = record pairs sharing one
— the char-multiset-blocked ``jaro_winkler_join`` over the token
VOCABULARIES (distinct tokens, corpus-sublinear), θ > 0.8 (the JW
join's soundness floor; raise θ or pre-block + score a candset for
looser settings).

100 TB notes: the vocabulary join scales with distinct tokens; the
token->record expansions are equi-joins on token (AQE skew split);
term aggregation keys are candidate pairs (no window over records).
``Σ w²`` and the ``w1·w2`` term products run in DECIMAL(38,0) —
BIGINT would wrap silently (ANSI off) once ``w = N·SOFT_SCALE``
passes ~3·10^9, i.e. a df=1 token in a ~3M-record corpus; DECIMAL
stays exact to ~10^16 records (the oracle mirrors with HUGEINT).
The one Python stage is the Arrow-batched exact-summation of
per-pair term lists — candidate-bound, like every verify kernel here.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tokenizers import Tokenizer
from ..validation import validate_join_inputs
from .jaro import jaro_winkler_join

#: weight quantization: w = (N * SOFT_SCALE) DIV df  (BIGINT-exact Σw²)
SOFT_SCALE = 1_000


def soft_tfidf_join(
    l_df: DataFrame,
    r_df: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_join_attr: str,
    r_join_attr: str,
    tokenizer: Tokenizer,
    threshold: float,
    theta: float = 0.9,
    comp_op: str = ">=",
    *,
    self_join: bool = False,
    l_out_prefix: str = "l_",
    r_out_prefix: str = "r_",
    out_sim_score: bool = True,
) -> DataFrame:
    """Pairs with ``soft_tfidf(l, r) comp_op threshold`` (module
    docstring carries the exact semantics).

    -> DataFrame(l_<l_key_attr>, r_<r_key_attr>[, _sim_score])."""
    if comp_op not in (">=", ">"):
        raise ValueError(f"comp_op must be '>=' or '>', got {comp_op!r}")
    if not (0.0 < threshold):
        raise ValueError(f"threshold must be positive, got {threshold!r}")
    if not (0.8 < theta <= 1.0):
        raise ValueError(
            f"soft_tfidf_join requires theta > 0.8 (got {theta}): the sound "
            "token-level Jaro-Winkler blocking bound vanishes below it"
        )
    validate_join_inputs(l_df, r_df, l_key_attr, r_key_attr,
                         l_join_attr, r_join_attr)
    tok = tokenizer.with_return_set(True)

    def side(df, key, attr, kname):
        return (df.where(F.col(attr).isNotNull())
                  .select(F.col(key).alias(kname),
                          tok.spark_expr(F.col(attr)).alias("__toks"))
                  .where(F.size("__toks") > 0))

    # deliberately NOT persisted despite four consuming branches (df
    # counts, norms, vocabulary, term expansion): the subtree is a
    # pruned linear scan + tokenize, and a same-host A/B at sf0.1
    # measured the tracked-persist variant SLOWER (244s vs 157s —
    # InMemoryRelation hides broadcast-size stats and adds a
    # materialization barrier). weighted.py's persist is different:
    # its recompute repeats a crossJoin+aggregate. At 100 TB,
    # checkpoint the tokenized sides explicitly if the repeated scans
    # dominate.
    l_side = side(l_df, l_key_attr, l_join_attr, "__lk")
    r_side = side(r_df, r_key_attr, r_join_attr, "__rk")
    l_ex = l_side.select("__lk", F.explode("__toks").alias("__tok"))
    r_ex = r_side.select("__rk", F.explode("__toks").alias("__tok"))

    # shared weight space over the union corpus. On a self-join the two
    # sides are the same table: count it once, don't double every df.
    if self_join:
        corpus_ex, n_records = l_ex, l_side.count()
    else:
        corpus_ex = l_ex.select(F.col("__tok")).unionAll(
            r_ex.select(F.col("__tok")))
        n_records = l_side.count() + r_side.count()
    if n_records == 0:
        # schema-preserving empty result (key dtypes from the inputs)
        out = (l_df.select(F.col(l_key_attr).alias(f"{l_out_prefix}{l_key_attr}"))
               .limit(0)
               .crossJoin(r_df.select(
                   F.col(r_key_attr).alias(f"{r_out_prefix}{r_key_attr}")).limit(0)))
        if out_sim_score:
            out = out.withColumn("_sim_score", F.lit(0.0))
        return out
    wtab = (corpus_ex.groupBy("__tok").agg(F.count("*").alias("__df"))
            .select("__tok",
                    F.expr(f"CAST({int(n_records) * SOFT_SCALE} DIV __df "
                           "AS BIGINT)").alias("__w")))

    # per-record L2 norms: Σ w² exact in DECIMAL(38,0) (w² alone
    # overflows BIGINT once w = N*SOFT_SCALE passes ~3e9, i.e. ~3M
    # records with a df=1 token — and this session runs ANSI-off, so
    # BIGINT would WRAP silently), then one IEEE sqrt of the
    # round-to-nearest double (the oracle mirrors with HUGEINT)
    def norms(ex, kname):
        w_dec = F.col("__w").cast("decimal(38,0)")
        return (ex.join(wtab, "__tok")
                  .groupBy(kname)
                  .agg(F.sqrt(F.sum(w_dec * F.col("__w"))
                              .cast("double")).alias("__n")))

    l_norm = norms(l_ex, "__lk")
    r_norm = norms(r_ex, "__rk")

    # lossless blocking: token pairs with jw >= theta over the
    # vocabularies (the one shared blocking stage — monge_elkan.py)
    from .monge_elkan import token_pair_candidates

    tp = token_pair_candidates(l_ex, r_ex, jaro_winkler_join, theta,
                               want_score=True)

    # close-pair terms: per (pair, left token a) keep the closest b
    # (ties by largest weight) — ONE max(struct(jw, w)) aggregate
    lw = l_ex.join(wtab, "__tok").select(
        "__lk", F.col("__tok").alias("__a"), F.col("__w").alias("__w1"))
    rw = r_ex.join(wtab, "__tok").select(
        "__rk", F.col("__tok").alias("__b"), F.col("__w").alias("__w2"))
    rows = (lw.join(tp, lw["__a"] == tp["__lt"])
              .join(rw, tp["__rt"] == rw["__b"]))
    if self_join:
        rows = rows.where(F.col("__lk") < F.col("__rk"))
    best = rows.groupBy("__lk", "__rk", "__a", "__w1").agg(
        F.max(F.struct(F.col("__jw"), F.col("__w2"))).alias("__m"))
    # w1*w2 in DECIMAL for the same BIGINT-wrap reason as the norms
    terms = best.select(
        "__lk", "__rk",
        ((F.col("__w1").cast("decimal(38,0)") * F.col("__m.__w2"))
         .cast("double") * F.col("__m.__jw")).alias("__term"))

    @F.pandas_udf(T.DoubleType())
    def _fsum(ts: pd.Series) -> pd.Series:
        # Arrow-batched exact summation of the per-pair term arrays:
        # order-independent, matching the oracle's fsum to <= 1 ulp
        return pd.Series([math.fsum(t) for t in ts], dtype="float64")

    raw = (terms.groupBy("__lk", "__rk")
                .agg(F.collect_list("__term").alias("__ts"))
                .select("__lk", "__rk", _fsum(F.col("__ts")).alias("__raw")))

    from ..filter_math import COMP_OP_MAP

    lk = f"{l_out_prefix}{l_key_attr}"
    rk = f"{r_out_prefix}{r_key_attr}"
    scored = (raw.join(l_norm, "__lk").join(r_norm.withColumnRenamed("__n", "__n2"),
                                            "__rk")
                 .select(F.col("__lk").alias(lk), F.col("__rk").alias(rk),
                         (F.col("__raw") / (F.col("__n") * F.col("__n2")))
                         .alias("_sim_score")))
    out = scored.where(COMP_OP_MAP[comp_op](F.col("_sim_score"),
                                            F.lit(float(threshold))))
    if not out_sim_score:
        out = out.drop("_sim_score")
    return out
