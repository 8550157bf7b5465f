"""Shared filter plumbing (``[R] py_stringsimjoin/filter/filter.py``
base class). Filter semantics: ``filter_pair`` returns True when the
pair is DROPPED (reference convention); ``filter_tables`` returns the
surviving candidate-pair DataFrame (no scores); ``filter_candset``
prunes an existing candset DataFrame."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..joins.core import missing_pairs, prepare_sides, project_output
from ..tokenizers import Tokenizer


class Filter:
    tokenizer: Tokenizer
    allow_missing: bool

    def filter_pair(self, l_string: str | None, r_string: str | None) -> bool:
        raise NotImplementedError

    def _survivor_pairs(
        self, prep_l: DataFrame, prep_r: DataFrame, ranks: DataFrame
    ) -> DataFrame:
        """-> DataFrame(l_id, r_id) of surviving pairs."""
        raise NotImplementedError

    def _coerced_tokenizer(self) -> Tokenizer:
        return self.tokenizer.with_return_set(True)

    def filter_tables(
        self,
        l_df: DataFrame,
        r_df: DataFrame,
        l_key_attr: str,
        r_key_attr: str,
        l_filter_attr: str,
        r_filter_attr: str,
        l_out_attrs: list[str] | None = None,
        r_out_attrs: list[str] | None = None,
        l_out_prefix: str = "l_",
        r_out_prefix: str = "r_",
        *,
        self_join: bool = False,
    ) -> DataFrame:
        prep_l, prep_r, ranks = prepare_sides(
            l_df, r_df, l_key_attr, r_key_attr, l_filter_attr, r_filter_attr,
            self._coerced_tokenizer(),
        )
        pairs = self._survivor_pairs(prep_l, prep_r, ranks)
        if self_join:
            pairs = pairs.where(F.col("l_id") < F.col("r_id"))
        if self.allow_missing:
            pairs = pairs.unionByName(
                missing_pairs(
                    l_df, r_df, l_key_attr, r_key_attr, l_filter_attr, r_filter_attr,
                    self_join=self_join,
                ).drop("_sim_score")
            )
        return project_output(
            pairs, l_df, r_df, l_key_attr, r_key_attr, l_out_attrs, r_out_attrs,
            l_out_prefix, r_out_prefix, out_sim_score=False,
        )

    def filter_candset(
        self,
        candset: DataFrame,
        candset_l_key_attr: str,
        candset_r_key_attr: str,
        l_df: DataFrame,
        r_df: DataFrame,
        l_key_attr: str,
        r_key_attr: str,
        l_filter_attr: str,
        r_filter_attr: str,
    ) -> DataFrame:
        """Prune candset rows whose underlying string pair the filter
        drops (``[R] py_stringsimjoin/filter/filter.py::Filter.
        filter_candset``). Missing-attr pairs survive iff
        allow_missing.

        Scale shape: survivor pairs are computed only for ids that
        actually appear in the candset (left-semi pushdown) — at 100x
        the candset is typically a small slice of the tables and the
        pairwise work must not scale with the full tables. The global
        token-frequency ranks still come from the FULL tables, so
        per-pair prefix/position decisions are identical to the
        unrestricted computation (a record's prefix depends only on
        its own tokens + global ranks, never on other rows)."""
        from ..cache import track
        from ..joins.core import build_token_ranks, order_tokens, tokenize_table

        tok = self._coerced_tokenizer()
        same = l_key_attr == r_key_attr and l_filter_attr == r_filter_attr and (
            l_df is r_df or l_df.sameSemantics(r_df)
        )
        tok_l_full = tokenize_table(l_df, l_key_attr, l_filter_attr, tok)
        tok_r_full = tok_l_full if same else tokenize_table(
            r_df, r_key_attr, r_filter_attr, tok
        )
        ranks = track(
            build_token_ranks([tok_l_full] if same else [tok_l_full, tok_r_full])
        )
        l_ids = candset.select(F.col(candset_l_key_attr).alias("__cid")).distinct()
        r_ids = candset.select(F.col(candset_r_key_attr).alias("__cid")).distinct()
        l_restr = l_df.join(l_ids, l_df[l_key_attr] == l_ids["__cid"], "left_semi")
        r_restr = r_df.join(r_ids, r_df[r_key_attr] == r_ids["__cid"], "left_semi")
        prep_l = order_tokens(
            tokenize_table(l_restr, l_key_attr, l_filter_attr, tok), ranks
        )
        prep_r = order_tokens(
            tokenize_table(r_restr, r_key_attr, r_filter_attr, tok), ranks
        )
        surv = self._survivor_pairs(prep_l, prep_r, ranks).withColumn("_keep", F.lit(1))
        out = candset.join(
            surv,
            (candset[candset_l_key_attr] == surv["l_id"])
            & (candset[candset_r_key_attr] == surv["r_id"]),
            "left",
        )
        if self.allow_missing:
            l_null = l_df.where(F.col(l_filter_attr).isNull()).select(
                F.col(l_key_attr).alias("__lnull")
            )
            r_null = r_df.where(F.col(r_filter_attr).isNull()).select(
                F.col(r_key_attr).alias("__rnull")
            )
            out = out.join(
                l_null, candset[candset_l_key_attr] == l_null["__lnull"], "left"
            ).join(r_null, candset[candset_r_key_attr] == r_null["__rnull"], "left")
            keep = (
                F.col("_keep").isNotNull()
                | F.col("__lnull").isNotNull()
                | F.col("__rnull").isNotNull()
            )
            return out.where(keep).select(*[candset[c] for c in candset.columns])
        return out.where(F.col("_keep").isNotNull()).select(
            *[candset[c] for c in candset.columns]
        )
