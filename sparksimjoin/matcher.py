"""apply_matcher (``[R] py_stringsimjoin/matcher/apply_matcher.py``;
SURVEY.md §2.1 #12): generic verify stage over a pre-built candset.

``sim_function`` is either a measure name — set measures ('JACCARD',
'COSINE', 'DICE', 'OVERLAP', 'OVERLAP_COEFFICIENT') and
'EDIT_DISTANCE' scored with pure Column expressions (JVM, no Python);
character/hybrid measures ('JARO', 'JARO_WINKLER', 'MONGE_ELKAN',
'NEEDLEMAN_WUNSCH', 'SMITH_WATERMAN', 'AFFINE') through exact
Arrow-batched kernels — or an arbitrary Python callable (the
reference's extension point), scored through an Arrow-batched pandas
UDF: ``(l_tokens, r_tokens) -> float`` when a tokenizer is given,
``(l_str, r_str) -> float`` with ``tokenizer=None``."""

from __future__ import annotations

from typing import Callable, Union

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .filter_math import COMP_OP_MAP, EDIT_DISTANCE, SET_SIM_MEASURES, sim_expr
from .tokenizers import Tokenizer

SimFunction = Union[str, Callable[[list, list], float]]


def _hybrid_token_udf(tokenizer: Tokenizer, sim_fn, inner_fn):
    """Arrow-batched scorer for the hybrid token measures (Monge-Elkan,
    Generalized Jaccard): ``sim_fn(tokens_a, tokens_b, inner=inner_fn)``
    with memoization. Candidate pairs repeat the same token pairs AND
    the same records massively (vocabulary << pair volume), so
    lru_caches on the inner character kernel and on tokenization
    collapse the Python call volume to ~distinct-token-pair count —
    deterministic (pure functions), bounded (maxsize). lru_cache
    wrappers do not pickle, so the caches are created lazily on the
    worker (first batch) and stashed in a closure-level dict — the
    deserialized UDF's closure persists across Arrow batches within a
    worker process, so reuse spans every batch that worker scores
    (building them inside the body unconditionally would discard them
    per batch)."""
    from functools import lru_cache

    tok = tokenizer
    state: dict = {}  # empty at pickle time; populated per worker

    @F.pandas_udf(T.DoubleType())
    def udf(ls: pd.Series, rs: pd.Series) -> pd.Series:
        if not state:
            state["inner"] = lru_cache(maxsize=1 << 20)(inner_fn)
            state["tokenize"] = lru_cache(maxsize=1 << 18)(
                lambda s: tuple(tok.tokenize(s)))
        inner = state["inner"]
        tokenize = state["tokenize"]
        return pd.Series(
            [
                None
                if a is None or b is None
                else sim_fn(tokenize(a), tokenize(b), inner=inner)
                for a, b in zip(ls, rs)
            ],
            dtype="float64",
        )

    return udf


def apply_matcher(
    candset: DataFrame,
    candset_l_key_attr: str,
    candset_r_key_attr: str,
    l_df: DataFrame,
    r_df: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_match_attr: str,
    r_match_attr: str,
    tokenizer: Tokenizer | None,
    sim_function: SimFunction,
    threshold: float,
    comp_op: str = ">=",
    allow_missing: bool = False,
    out_sim_score: bool = True,
    score_attr: str = "_sim_score",
) -> DataFrame:
    """Score each candset pair on (l_match_attr, r_match_attr) and
    keep pairs satisfying comp_op/threshold. Candset columns are
    preserved; the score is appended when out_sim_score."""
    l_side = l_df.select(
        F.col(l_key_attr).alias("__lk"), F.col(l_match_attr).alias("__ls")
    )
    r_side = r_df.select(
        F.col(r_key_attr).alias("__rk"), F.col(r_match_attr).alias("__rs")
    )
    named_set_measure = (
        isinstance(sim_function, str) and sim_function.upper() in SET_SIM_MEASURES
    )
    if named_set_measure:
        # tokenize + hash ONCE PER SIDE ROW (not per candidate pair):
        # int arrays keep array_intersect on the primitive codegen path
        tok = tokenizer.with_return_set(True)

        def hashed(col):
            return F.array_sort(F.transform(tok.spark_expr(col), lambda x: F.xxhash64(x)))

        l_side = l_side.withColumn("__lt", hashed(F.col("__ls")))
        r_side = r_side.withColumn("__rt", hashed(F.col("__rs")))
    joined = candset.join(
        l_side, candset[candset_l_key_attr] == l_side["__lk"], "left"
    ).join(r_side, candset[candset_r_key_attr] == r_side["__rk"], "left")

    if isinstance(sim_function, str):
        measure = sim_function.upper()
        if measure == EDIT_DISTANCE:
            score = F.levenshtein(F.col("__ls"), F.col("__rs")).cast("double")
        elif measure == "BAG_DISTANCE":
            # char-multiset distance as a pure Column expression (JVM,
            # no UDF) — distance semantics like EDIT_DISTANCE, so pair
            # it with comp_op '<='
            from .simfunctions import bag_distance_expr

            score = bag_distance_expr(F.col("__ls"), F.col("__rs"))
        elif measure == "EDITEX":
            # phonetic edit distance (Zobel & Dart 1996) at the
            # conventional costs (0/1/2); distance semantics — pair
            # with comp_op '<='. Parameterized costs via the callable
            # path with Editex(...) instances and tokenizer=None.
            from .simfunctions import Editex, _batched

            score = _batched(Editex())(F.col("__ls"), F.col("__rs"))
        elif measure in ("JARO", "JARO_WINKLER"):
            # character-level measures: Arrow-batched exact kernels on
            # the raw strings (simfunctions.py); no tokenizer involved
            from .simfunctions import jaro_expr, jaro_winkler_expr

            expr = jaro_winkler_expr if measure == "JARO_WINKLER" else jaro_expr
            score = expr(F.col("__ls"), F.col("__rs"))
        elif measure in ("NEEDLEMAN_WUNSCH", "SMITH_WATERMAN", "AFFINE"):
            # sequence-alignment measures at the conventional defaults
            # (alignment.py): raw-string Arrow-batched kernels, no
            # tokenizer involved; parameterized variants go through the
            # callable path (NeedlemanWunsch(...) instances ARE
            # callables) with tokenizer=None
            from .alignment import ALIGNMENT_MEASURES
            from .simfunctions import _batched

            score = _batched(ALIGNMENT_MEASURES[measure])(
                F.col("__ls"), F.col("__rs")
            )
        elif measure == "GENERALIZED_JACCARD":
            # hybrid token measure at the conventional defaults (Jaro
            # inner, sim_threshold 0.5); parameterized variants via the
            # callable path with GeneralizedJaccard(...) instances
            assert tokenizer is not None, "tokenizer required for GENERALIZED_JACCARD"
            from .simfunctions import generalized_jaccard_sim, jaro_sim

            score = _hybrid_token_udf(tokenizer, generalized_jaccard_sim,
                                      jaro_sim)(F.col("__ls"), F.col("__rs"))
        elif measure == "MONGE_ELKAN":
            # hybrid measure (Jaro-Winkler inner): tokens are taken
            # EXACTLY as the tokenizer produces them (bag or set — no
            # coercion; the mean weights duplicate tokens when a bag
            # tokenizer is passed). Asymmetric: left -> right.
            assert tokenizer is not None, "tokenizer required for MONGE_ELKAN"
            from .simfunctions import jaro_winkler_sim, monge_elkan_sim

            score = _hybrid_token_udf(tokenizer, monge_elkan_sim,
                                      jaro_winkler_sim)(F.col("__ls"), F.col("__rs"))
        else:
            assert measure in SET_SIM_MEASURES, measure
            assert tokenizer is not None, "tokenizer required for set measures"
            score = sim_expr(F.col("__lt"), F.col("__rt"), measure)
    else:
        # callable sim_function (the reference's extension point). With a
        # tokenizer the callable receives token lists; with
        # tokenizer=None it receives the RAW strings — the upstream
        # convention for character-level sim functions (jaro, the
        # alignment measures) passed straight through.
        tok = tokenizer
        fn = sim_function

        @F.pandas_udf(T.DoubleType())
        def score_udf(ls: pd.Series, rs: pd.Series) -> pd.Series:
            if tok is None:
                vals = [
                    None if a is None or b is None else float(fn(a, b))
                    for a, b in zip(ls, rs)
                ]
            else:
                vals = [
                    None
                    if a is None or b is None
                    else float(fn(tok.tokenize(a), tok.tokenize(b)))
                    for a, b in zip(ls, rs)
                ]
            return pd.Series(vals, dtype="float64")

        score = score_udf(F.col("__ls"), F.col("__rs"))

    scored = joined.withColumn(score_attr, score)
    missing = F.col("__ls").isNull() | F.col("__rs").isNull()
    keep = COMP_OP_MAP[comp_op](F.col(score_attr), F.lit(float(threshold)))
    if allow_missing:
        keep = keep | missing
        scored = scored.withColumn(
            score_attr, F.when(missing, F.lit(None).cast("double")).otherwise(F.col(score_attr))
        )
    else:
        keep = keep & ~missing
    out_cols = [candset[c] for c in candset.columns]
    if out_sim_score:
        out_cols.append(F.col(score_attr))
    return scored.where(keep).select(*out_cols)
