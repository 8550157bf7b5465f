"""Pair featurization + rule-based matching for entity resolution.

``featurize_pairs`` turns a candidate-pair set into a per-pair feature
vector — the bridge from blocking to a downstream (ML or rule-based)
matcher. This is the Spark-first counterpart of Magellan's
``extract_feature_vecs`` (py_entitymatching; the upstream
py_stringsimjoin sits inside that ecosystem and its README points
users there for matching) — but where Magellan computes features
row-at-a-time in Python over a pandas candset, here every default
feature is a pure Column expression (whole-stage codegen; the only
Arrow-batched UDFs are the exact Jaro/Jaro-Winkler kernels, which are
bit-identical to DuckDB's builtins — property-tested in
tests/test_jaro.py).

Scale shape: strings are tokenized ONCE PER RECORD (on the projected
side frames, before the key joins), never per pair; the candset then
meets each side in an equi-join on the key — broadcastable when a
side is small, AQE-handled otherwise. Feature arithmetic is per-pair
narrow work. No shuffle beyond the two key joins.

``match_by_rules`` evaluates an ordered list of boolean SQL rules
(Magellan's boolean-rule matcher: each rule is typically a
conjunction of feature predicates; the matcher is their disjunction)
and keeps pairs where any rule fires, recording the FIRST firing
rule's 1-based index — deterministic and auditable.

``attr_equivalence_block`` is the third Magellan counterpart
(``AttrEquivalenceBlocker``): candidate pairs = records agreeing
exactly on one or more blocking attributes — one Spark equi-join, so
Catalyst broadcasts a small side and AQE splits skewed blocks. Block
sizes are data-dependent and a single hot value makes output
QUADRATIC in that block, so ``max_block_size`` (block purging — the
standard ER mitigation, e.g. Papadakis et al.'s block processing
surveys) drops oversized blocks with the dropped volume surfaced via
``metrics_out``, never silently. Different blockers' candsets compose
by distinct union (Magellan's ``combine_blocker_outputs_via_union``)
— see ``union_candsets``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import filter_math as fm
from .tokenizers import QgramTokenizer, Tokenizer, WhitespaceTokenizer

#: default feature names, in output order
DEFAULT_FEATURES = (
    "exact_match",
    "len_l",
    "len_r",
    "len_diff",
    "rel_len_diff",
    "n_tok_l",
    "n_tok_r",
    "overlap_ws",
    "jaccard_ws",
    "dice_ws",
    "cosine_ws",
    "overlap_coeff_ws",
    "jaccard_qg3",
    "lev_dist",
    "lev_sim",
    "jaro",
    "jaro_winkler",
)


def featurize_pairs(
    candset: DataFrame,
    candset_l_key_attr: str,
    candset_r_key_attr: str,
    l_df: DataFrame,
    r_df: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_attr: str,
    r_attr: str,
    features: list[str] | None = None,
    ws_tokenizer: Tokenizer | None = None,
    qg_tokenizer: Tokenizer | None = None,
) -> DataFrame:
    """Append per-pair similarity features to ``candset``.

    Candset columns are preserved; one column per requested feature is
    added (DEFAULT_FEATURES when ``features`` is None). Null join
    attributes propagate to null features (the ML-matcher convention:
    missingness is information, not an error).

    Feature semantics (l = left string, r = right string):

    - ``exact_match``       int: 1 iff l = r (null-propagating)
    - ``len_l``/``len_r``   int string lengths
    - ``len_diff``          int abs(len_l - len_r)
    - ``rel_len_diff``      double len_diff / max(len_l, len_r); 0.0
                            when both strings are empty
    - ``n_tok_l``/``n_tok_r`` int distinct whitespace-token counts
    - ``overlap_ws``        double |l ∩ r| on distinct ws tokens
    - ``jaccard_ws`` / ``dice_ws`` / ``cosine_ws`` /
      ``overlap_coeff_ws`` double set sims on distinct ws tokens
                            (filter_math.sim_expr — both-empty 1.0,
                            one-empty 0.0)
    - ``jaccard_qg3``       double jaccard on distinct padded 3-grams
    - ``lev_dist``          int Levenshtein distance
    - ``lev_sim``           double 1 - lev_dist/max(len_l, len_r);
                            1.0 when both strings are empty
    - ``jaro`` / ``jaro_winkler`` double exact kernels
                            (simfunctions.py; Winkler defaults)
    """
    feats = list(features) if features is not None else list(DEFAULT_FEATURES)
    unknown = [f for f in feats if f not in DEFAULT_FEATURES]
    assert not unknown, f"unknown features {unknown}; available: {DEFAULT_FEATURES}"
    ws = ws_tokenizer or WhitespaceTokenizer()
    qg = qg_tokenizer or QgramTokenizer(qval=3, padding=True)
    ws = ws.with_return_set(True)
    qg = qg.with_return_set(True)

    need_ws = any(f.endswith("_ws") or f in ("n_tok_l", "n_tok_r") for f in feats)
    need_qg = "jaccard_qg3" in feats

    # per-record prep (ONE tokenize per side row, pre-join)
    l_cols = [F.col(l_key_attr).alias("__lk"), F.col(l_attr).alias("__ls")]
    r_cols = [F.col(r_key_attr).alias("__rk"), F.col(r_attr).alias("__rs")]
    if need_ws:
        l_cols.append(ws.spark_expr(F.col(l_attr)).alias("__lw"))
        r_cols.append(ws.spark_expr(F.col(r_attr)).alias("__rw"))
    if need_qg:
        l_cols.append(qg.spark_expr(F.col(l_attr)).alias("__lq"))
        r_cols.append(qg.spark_expr(F.col(r_attr)).alias("__rq"))
    l_side = l_df.select(*l_cols)
    r_side = r_df.select(*r_cols)

    joined = candset.join(
        l_side, candset[candset_l_key_attr] == l_side["__lk"], "left"
    ).join(r_side, candset[candset_r_key_attr] == r_side["__rk"], "left")

    ls, rs = F.col("__ls"), F.col("__rs")
    len_l = F.length(ls)
    len_r = F.length(rs)
    max_len = F.greatest(len_l, len_r).cast("double")

    def build(name: str) -> Column:
        if name == "exact_match":
            return (ls == rs).cast("int")
        if name == "len_l":
            return len_l
        if name == "len_r":
            return len_r
        if name == "len_diff":
            return F.abs(len_l - len_r)
        if name == "rel_len_diff":
            return F.when(max_len == 0, F.lit(0.0)).otherwise(
                F.abs(len_l - len_r).cast("double") / max_len
            )
        if name == "n_tok_l":
            return F.size(F.col("__lw"))
        if name == "n_tok_r":
            return F.size(F.col("__rw"))
        if name == "overlap_ws":
            return fm.sim_expr(F.col("__lw"), F.col("__rw"), fm.OVERLAP)
        if name == "jaccard_ws":
            return fm.sim_expr(F.col("__lw"), F.col("__rw"), fm.JACCARD)
        if name == "dice_ws":
            return fm.sim_expr(F.col("__lw"), F.col("__rw"), fm.DICE)
        if name == "cosine_ws":
            return fm.sim_expr(F.col("__lw"), F.col("__rw"), fm.COSINE)
        if name == "overlap_coeff_ws":
            return fm.sim_expr(F.col("__lw"), F.col("__rw"), fm.OVERLAP_COEFFICIENT)
        if name == "jaccard_qg3":
            return fm.sim_expr(F.col("__lq"), F.col("__rq"), fm.JACCARD)
        if name == "lev_dist":
            return F.levenshtein(ls, rs)
        if name == "lev_sim":
            return F.when(max_len == 0, F.lit(1.0)).otherwise(
                F.lit(1.0) - F.levenshtein(ls, rs).cast("double") / max_len
            )
        if name == "jaro":
            from .simfunctions import jaro_expr

            return jaro_expr(ls, rs)
        if name == "jaro_winkler":
            from .simfunctions import jaro_winkler_expr

            return jaro_winkler_expr(ls, rs)
        raise AssertionError(name)  # pragma: no cover - guarded above

    either_null = ls.isNull() | rs.isNull()
    out_cols = [candset[c] for c in candset.columns]
    for name in feats:
        out_cols.append(
            F.when(either_null, F.lit(None)).otherwise(build(name)).alias(name)
        )
    return joined.select(*out_cols)


def match_by_rules(
    features_df: DataFrame,
    rules: list[str],
    rule_attr: str = "matched_rule",
) -> DataFrame:
    """Keep rows where at least one boolean SQL ``rule`` holds;
    ``rule_attr`` records the 1-based index of the FIRST firing rule
    (rules are an ordered disjunction — Magellan's boolean-rule
    matcher). Rules are ANSI-SQL boolean expressions over the feature
    columns (e.g. ``"jaccard_ws >= 0.5 AND lev_dist <= 6"``), so the
    same strings run verbatim in the DuckDB oracle. A rule evaluating
    to NULL (null features) is treated as not firing."""
    assert rules, "at least one rule required"
    matched = F.lit(None).cast("int")
    # build CASE WHEN r1 THEN 1 WHEN r2 THEN 2 ... from the back
    for idx in range(len(rules), 0, -1):
        matched = F.when(F.expr(rules[idx - 1]), F.lit(idx)).otherwise(matched)
    return (
        features_df.withColumn(rule_attr, matched)
        .where(F.col(rule_attr).isNotNull())
    )


def attr_equivalence_block(
    l_df: DataFrame,
    r_df: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_block_attrs: str | list[str],
    r_block_attrs: str | list[str] | None = None,
    self_join: bool = False,
    max_block_size: int | None = None,
    metrics_out: dict | None = None,
    l_out_prefix: str = "l_",
    r_out_prefix: str = "r_",
) -> DataFrame:
    """Attribute-equivalence blocking: candidate pairs = record pairs
    whose blocking attribute(s) are EQUAL (SQL equality — rows with a
    null blocking attribute never pair, Magellan's convention). One
    equi-join on the block attrs; ``self_join=True`` keeps the
    canonical ``l_key < r_key`` orientation and requires l_df/r_df to
    be the same table.

    ``max_block_size``: blocks (distinct block-attr value combos) with
    more than this many rows on EITHER side are dropped entirely —
    block purging. A hot block value (e.g. a default/placeholder)
    otherwise makes the candset quadratic in that block at 100 TB, and
    unlike the token joins it CANNOT be salted away: the quadratic
    output is the semantics, so the only scale lever is to not emit
    it. Dropped block count is surfaced via ``metrics_out``
    ('purged_blocks' — an on-demand LazyCountMetric, no eager job) so
    the cap is never silent.

    -> DataFrame(l_<l_key_attr>, r_<r_key_attr>), distinct.
    """
    if r_block_attrs is None:
        r_block_attrs = l_block_attrs
    lb = [l_block_attrs] if isinstance(l_block_attrs, str) else list(l_block_attrs)
    rb = [r_block_attrs] if isinstance(r_block_attrs, str) else list(r_block_attrs)
    assert len(lb) == len(rb) and lb, "block attr lists must be same nonempty length"
    lk, rk = l_out_prefix + l_key_attr, r_out_prefix + r_key_attr
    bcols = [f"__b{i}" for i in range(len(lb))]
    a = l_df.select(
        F.col(l_key_attr).alias(lk), *[F.col(c).alias(b) for c, b in zip(lb, bcols)]
    )
    b = r_df.select(
        F.col(r_key_attr).alias(rk), *[F.col(c).alias(b_) for c, b_ in zip(rb, bcols)]
    )
    for bc in bcols:
        a = a.where(F.col(bc).isNotNull())
        b = b.where(F.col(bc).isNotNull())
    if max_block_size is not None:
        assert max_block_size >= 1, "max_block_size must be >= 1"
        from .joins.core import LazyCountMetric

        sizes = (
            a.groupBy(*bcols).agg(F.count(F.lit(1)).alias("__na"))
            if self_join
            else a.groupBy(*bcols).agg(F.count(F.lit(1)).alias("__na")).join(
                b.groupBy(*bcols).agg(F.count(F.lit(1)).alias("__nb")), bcols, "outer"
            )
        )
        big_cond = (
            F.col("__na") > max_block_size
            if self_join
            else (F.coalesce("__na", F.lit(0)) > max_block_size)
            | (F.coalesce("__nb", F.lit(0)) > max_block_size)
        )
        purged = sizes.where(big_cond).select(*bcols)
        if metrics_out is not None:
            metrics_out["max_block_size"] = max_block_size
            metrics_out["purged_blocks"] = LazyCountMetric(purged)
        a = a.join(purged, bcols, "left_anti")
        b = b.join(purged, bcols, "left_anti")
    out = a.join(b, bcols).select(lk, rk)
    if self_join:
        out = out.where(F.col(lk) < F.col(rk))
    return out.distinct()


def union_candsets(*candsets: DataFrame) -> DataFrame:
    """Distinct union of blocker outputs on their shared pair columns
    (Magellan's ``combine_blocker_outputs_via_union``). All candsets
    must share column names; extra columns are dropped to the common
    set so similarity-join outputs (with sim_score) union cleanly with
    pure pair frames."""
    assert candsets, "at least one candset required"
    common = set(candsets[0].columns)
    for c in candsets[1:]:
        common &= set(c.columns)
    assert common, "candsets share no columns"
    cols = [c for c in candsets[0].columns if c in common]
    out = candsets[0].select(*cols)
    for c in candsets[1:]:
        out = out.unionByName(c.select(*cols))
    return out.distinct()


def featurize_numeric_pairs(
    candset: DataFrame,
    candset_l_key_attr: str,
    candset_r_key_attr: str,
    l_df: DataFrame,
    r_df: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    attrs: list,
) -> DataFrame:
    """Append per-pair NUMERIC features to ``candset`` (the numeric
    half of Magellan's feature generation, Spark-first — pure Column
    arithmetic, no UDF). ``attrs``: attribute names present on both
    sides, or ``(l_attr, r_attr, out_name)`` triples.

    Per attribute ``a`` (null inputs propagate to null features, the
    ML-matcher convention):

    - ``{a}_exact``  int: 1 iff l = r
    - ``{a}_adiff``  double: ``abs(l - r)``
    - ``{a}_rdiff``  double: ``abs(l - r) / max(abs(l), abs(r))``;
                     0.0 when both values are 0 (this module's
                     documented convention for the relative-difference
                     denominator)
    """
    specs = [(a, a, a) if isinstance(a, str) else tuple(a) for a in attrs]
    l_cols = [F.col(l_key_attr).alias("__lk")] + [
        F.col(la).cast("double").alias(f"__l_{name}") for la, _, name in specs
    ]
    r_cols = [F.col(r_key_attr).alias("__rk")] + [
        F.col(ra).cast("double").alias(f"__r_{name}") for _, ra, name in specs
    ]
    joined = candset.join(
        l_df.select(*l_cols), candset[candset_l_key_attr] == F.col("__lk"), "left"
    ).join(
        r_df.select(*r_cols), candset[candset_r_key_attr] == F.col("__rk"), "left"
    )
    out_cols = [candset[c] for c in candset.columns]
    for _, _, name in specs:
        lv, rv = F.col(f"__l_{name}"), F.col(f"__r_{name}")
        denom = F.greatest(F.abs(lv), F.abs(rv))
        out_cols.append((lv == rv).cast("int").alias(f"{name}_exact"))
        out_cols.append(F.abs(lv - rv).alias(f"{name}_adiff"))
        out_cols.append(
            F.when(lv.isNull() | rv.isNull(), F.lit(None).cast("double"))
            .when(denom == 0, F.lit(0.0))
            .otherwise(F.abs(lv - rv) / denom)
            .alias(f"{name}_rdiff")
        )
    return joined.select(*out_cols)
