"""Fellegi-Sunter probabilistic record linkage with EM parameter
estimation (Fellegi & Sunter, JASA 1969; EM formulation per Winkler
1988 — the model behind Splink and most production probabilistic
linkage; beyond the upstream reference surface).

Given candidate pairs and a set of field *comparisons*, each pair is
reduced to a discrete agreement vector gamma = (g_1..g_K) (g_k = the
comparison's level, e.g. 0 = disagree, 1 = close, 2 = exact). The
model is a two-class mixture: for matches, P(g_k = l | M) = m_k[l];
for non-matches P(g_k = l | U) = u_k[l]; class prior
P(M) = lambda. EM estimates (lambda, m, u) unsupervised, and each
pattern gets

    match_weight      = log2( prod_k m_k[g_k] / u_k[g_k] )
    match_probability = lambda*prod m / (lambda*prod m + (1-lambda)*prod u)

Architecture (the Splink trick, which is what makes this exact AND
scalable): EM never iterates over pairs. The only distributed,
data-sized work is ONE exact integer aggregation — the histogram of
gamma patterns (``groupBy(*gammas).count()``, at most
prod_k(levels_k) rows regardless of corpus size). EM then runs on
that tiny histogram in plain Python on the driver (deterministic:
fixed iteration count, fixed init, pure float ops on a
pattern-ordered list), and the resulting per-pattern weights are
broadcast-joined back to the pairs. 10^12 candidate pairs cost the
same EM as 10^3 — the pattern space, not the data, bounds the
driver work. No windows, no UDFs; comparison levels are pure Column
expressions (whole-stage codegen).

Determinism contract: pattern counts are exact integers; EM is
driver-side Python over patterns sorted lexicographically, so results
are bit-identical across partitionings and re-runs (tested). The EM
itself is not SQL-expressible (iterative mixture fitting — pytest
precedent: ml.py training, streaming rows); the gamma/histogram stage
has a full DuckDB oracle (``fs_gamma_part``).
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: probability floor/ceiling — keeps EM away from degenerate 0/1
#: estimates (standard practice; also guards log2)
EPS = 1e-6


@dataclass(frozen=True)
class Comparison:
    """One field comparison: ``level_expr`` must evaluate to an int in
    [0, n_levels) — higher = stronger agreement; nulls must map to 0
    (the helpers below do)."""

    name: str
    level_expr: Column
    n_levels: int = 2


def exact_comparison(l_col: str, r_col: str, name: str | None = None) -> Comparison:
    """2-level: 1 iff both non-null and equal."""
    e = (F.col(l_col).isNotNull() & F.col(r_col).isNotNull()
         & (F.col(l_col) == F.col(r_col))).cast("int")
    return Comparison(name or f"exact_{l_col}", e, 2)


def levenshtein_comparison(
    l_col: str, r_col: str, k: int = 2, name: str | None = None
) -> Comparison:
    """3-level: 2 = exact, 1 = levenshtein <= k, 0 = otherwise/null."""
    lc, rc = F.col(l_col), F.col(r_col)
    both = lc.isNotNull() & rc.isNotNull()
    e = (
        F.when(both & (lc == rc), F.lit(2))
        .when(both & (F.levenshtein(lc, rc, k) >= 0), F.lit(1))
        .otherwise(F.lit(0))
    )
    return Comparison(name or f"lev_{l_col}", e, 3)


def numeric_comparison(
    l_col: str, r_col: str, rel_tol: float = 0.05, name: str | None = None
) -> Comparison:
    """3-level: 2 = equal, 1 = relative difference <= rel_tol, else 0."""
    lc, rc = F.col(l_col).cast("double"), F.col(r_col).cast("double")
    both = lc.isNotNull() & rc.isNotNull()
    denom = F.greatest(F.abs(lc), F.abs(rc))
    e = (
        F.when(both & (lc == rc), F.lit(2))
        .when(both & (denom > 0) & (F.abs(lc - rc) / denom <= rel_tol), F.lit(1))
        .otherwise(F.lit(0))
    )
    return Comparison(name or f"num_{l_col}", e, 3)


def comparison_vectors(
    pairs: DataFrame,
    ltable: DataFrame,
    rtable: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    comparisons: list[Comparison],
    l_pair_col: str = "l_id",
    r_pair_col: str = "r_id",
    keep_cols: list[str] = (),
) -> DataFrame:
    """Join the candidate pairs to both records and evaluate every
    comparison: output ``(l_id, r_id, gamma_<name>...)``. Column-expr
    only; the two prep joins are plain equi-joins on the keys.
    ``keep_cols`` (post-prefix names, e.g. ``l_p_type``) carries raw
    value columns through — needed by term-frequency adjustments,
    which look up the agreed value's corpus frequency at scoring
    time."""
    if not comparisons:
        raise ValueError("at least one Comparison is required")
    names = [c.name for c in comparisons]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate comparison names: {names}")
    for col in (l_pair_col, r_pair_col):
        if col not in pairs.columns:
            raise ValueError(f"pair column {col!r} not in pairs {pairs.columns}")
    # Comparisons are written against explicit ``l_<col>`` / ``r_<col>``
    # names (the helpers above take those names directly); guard the
    # rename against collisions with the pair-id columns or each other.
    l_names = {c: f"l_{c}" for c in ltable.columns if c != l_key_attr}
    r_names = {c: f"r_{c}" for c in rtable.columns if c != r_key_attr}
    final = [l_pair_col, r_pair_col, *l_names.values(), *r_names.values()]
    if len(set(final)) != len(final):
        raise ValueError(
            f"column-name collision after l_/r_ prefixing: {sorted(final)}; "
            "rename the offending table columns first"
        )
    lt = ltable.select(
        F.col(l_key_attr).alias(l_pair_col),
        F.lit(True).alias("__lok"),
        *[F.col(c).alias(a) for c, a in l_names.items()],
    )
    rt = rtable.select(
        F.col(r_key_attr).alias(r_pair_col),
        F.lit(True).alias("__rok"),
        *[F.col(c).alias(a) for c, a in r_names.items()],
    )
    prefixed = set(l_names.values()) | set(r_names.values())
    for c in keep_cols:
        if c not in prefixed:
            raise ValueError(
                f"keep_cols entry {c!r} is not a prefixed table column "
                f"(available: {sorted(prefixed)})"
            )
    # LEFT joins + per-row guard instead of inner joins: an inner join
    # would silently DROP any pair whose key is NULL or absent from
    # its table (stale candidates after a table cleanup), biasing the
    # EM fit and the scored output with no signal. The guard is folded
    # into every gamma column so column pruning can never remove it
    # while any gamma is consumed.
    joined = pairs.select(l_pair_col, r_pair_col).join(
        lt, l_pair_col, "left"
    ).join(rt, r_pair_col, "left")
    ok = F.col("__lok").isNotNull() & F.col("__rok").isNotNull()
    err = F.raise_error(F.concat(
        F.lit("pair key does not resolve against its table: ("),
        F.coalesce(F.col(l_pair_col).cast("string"), F.lit("NULL")),
        F.lit(", "),
        F.coalesce(F.col(r_pair_col).cast("string"), F.lit("NULL")),
        F.lit(") — NULL keys never match, and ltable/rtable must contain "
              "every id the candidate pairs reference"),
    ))
    return joined.select(
        l_pair_col, r_pair_col,
        *[F.when(ok, c.level_expr.cast("int")).otherwise(err)
          .alias(f"gamma_{c.name}") for c in comparisons],
        *keep_cols,
    )


@dataclass(frozen=True)
class TfAdjustment:
    """Term-frequency adjustment for one comparison (Winkler 1989;
    the Splink ``tf_adjustments`` feature): agreement on a RARE value
    is stronger evidence than agreement on a common one, so for pairs
    at the comparison's TOP level (which for the built-in helpers
    means exact equality — the agreed value is well-defined) the
    non-match probability u[top] is replaced by the agreed value's
    corpus frequency tf(v) = P(a random record carries v):

        match_weight      += weight * log2(u[top] / tf(v))
        match_probability  = pm / (pm + pu * (tf(v) / u[top])**weight)

    ``value_col`` names the vectors column carrying the agreed value
    (pass it through :func:`comparison_vectors` via ``keep_cols``,
    e.g. ``"l_p_type"`` — at the top level both sides are equal so
    either side works). ``weight`` damps the adjustment (1.0 = full,
    Splink's ``tf_adjustment_weight``)."""

    comparison: str
    value_col: str
    weight: float = 1.0


def term_frequencies(df: DataFrame, attr: str) -> DataFrame:
    """-> ``(value, tf)``: relative frequency of each non-null value
    of ``attr`` — P(a random record = v). One map-side-combinable
    groupBy; the scalar total joins back as a 1-row broadcast. At
    10^12 records the output is vocabulary-sized and the scoring join
    on it is a plain equi-join (Spark's stats broadcast it when
    small)."""
    nonnull = df.where(F.col(attr).isNotNull())
    counts = nonnull.groupBy(F.col(attr).alias("value")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    # the 1-row total comes from the base frame, not from ``counts`` —
    # a counts-derived aggregate shares attribute ids with the left
    # join side and trips Spark's self-join ambiguity resolution
    total = nonnull.agg(F.count(F.lit(1)).alias("__N"))
    return counts.crossJoin(F.broadcast(total)).select(
        "value",
        (counts["__n"].cast("double") / total["__N"].cast("double")).alias("tf"),
    )


def gamma_histogram(vectors: DataFrame, gamma_cols: list[str]) -> DataFrame:
    """Exact pattern counts — the ONLY data-sized aggregation EM
    needs. At most prod(levels) rows."""
    return vectors.groupBy(*gamma_cols).agg(F.count(F.lit(1)).alias("n"))


def _em(
    patterns: list[tuple[tuple[int, ...], int]],
    n_levels: list[int],
    max_iter: int,
    initial_lambda: float,
) -> tuple[float, list[list[float]], list[list[float]]]:
    """Driver-side EM on the pattern histogram. Deterministic: the
    caller passes patterns sorted lexicographically."""
    k = len(n_levels)
    total = sum(n for _, n in patterns)
    # init: u from the observed marginal level frequencies (the
    # all-pairs distribution is dominated by non-matches), m biased
    # toward the top level
    u = []
    m = []
    for j in range(k):
        freq = [0.0] * n_levels[j]
        for g, n in patterns:
            freq[g[j]] += n
        u.append([max(f / total, EPS) for f in freq])
        top = n_levels[j] - 1
        mj = [0.05 / max(top, 1)] * n_levels[j]
        mj[top] = 0.95
        m.append(mj)
    lam = initial_lambda

    for _ in range(max_iter):
        # E-step per pattern
        resp = []
        for g, n in patterns:
            pm = lam
            pu = 1.0 - lam
            for j in range(k):
                pm *= m[j][g[j]]
                pu *= u[j][g[j]]
            p = pm / (pm + pu) if (pm + pu) > 0 else 0.0
            resp.append(p)
        # M-step
        wm = sum(n * p for (_, n), p in zip(patterns, resp))
        wu = sum(n * (1 - p) for (_, n), p in zip(patterns, resp))
        lam = min(max(wm / total, EPS), 1 - EPS)
        for j in range(k):
            sm = [0.0] * n_levels[j]
            su = [0.0] * n_levels[j]
            for (g, n), p in zip(patterns, resp):
                sm[g[j]] += n * p
                su[g[j]] += n * (1 - p)
            m[j] = [min(max(s / wm if wm > 0 else EPS, EPS), 1 - EPS) for s in sm]
            u[j] = [min(max(s / wu if wu > 0 else EPS, EPS), 1 - EPS) for s in su]
    return lam, m, u


def _pattern_rows(patterns, lam, m, u):
    """Per-pattern ``(*g, __pm, __pu, match_weight,
    match_probability)``. All four floats are computed HERE in driver
    Python (same op order as the original scorer), so unadjusted
    outputs are engine-independent literals — the oracle inlines the
    identical doubles and only TF-adjustment arithmetic runs
    engine-side."""
    rows = []
    for g in patterns:
        pm, pu = lam, 1.0 - lam
        w = 0.0
        for j, lv in enumerate(g):
            pm *= m[j][lv]
            pu *= u[j][lv]
            w += math.log2(m[j][lv] / u[j][lv])
        # same underflow guard as _em's E-step: with dozens of
        # comparisons both products can underflow to exactly 0.0
        rows.append((*g, pm, pu, w, pm / (pm + pu) if (pm + pu) > 0 else 0.0))
    return rows


def _attach_scores(
    vectors: DataFrame,
    comparisons: list[Comparison],
    lam: float,
    m: list[list[float]],
    u: list[list[float]],
    patterns: list[tuple[int, ...]],
    tf_adjust: list[TfAdjustment] = (),
    tf_tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Broadcast-join the per-pattern weight table onto the vectors
    and (optionally) apply term-frequency adjustments. The weight
    table is at most prod(levels) rows; each adjustment adds one
    equi-join on the agreed-value column against a vocabulary-sized
    tf table — no data-sized shuffle beyond those joins."""
    spark = vectors.sparkSession
    gcols = [f"gamma_{c.name}" for c in comparisons]
    # scoring is an inner join against the ENUMERATED pattern table
    # (every in-range pattern has a row), so an out-of-range or NULL
    # gamma would not error — the pair would silently vanish from the
    # output. That happens exactly when a level_expr lacks a terminal
    # .otherwise(0) or the declared n_levels drifted from the params
    # the vectors were built with (easy after load_fs_params). Fail
    # loudly per row instead: the guard is a pure JVM conditional on
    # the join key, no extra job.
    guarded = {}
    for c in comparisons:
        g = F.col(f"gamma_{c.name}")
        ok = g.isNotNull() & (g >= 0) & (g < c.n_levels)
        guarded[f"gamma_{c.name}"] = F.when(ok, g).otherwise(
            F.raise_error(F.concat(
                F.lit(f"gamma_{c.name} = "),
                F.coalesce(g.cast("string"), F.lit("NULL")),
                F.lit(
                    f" outside [0, {c.n_levels}): every Comparison "
                    "level_expr must map every input to a declared level "
                    "(end with .otherwise(0)), and n_levels must match "
                    "the params the vectors were scored against"
                ),
            ))
        )
    vectors = vectors.withColumns(guarded)
    wtab = spark.createDataFrame(
        _pattern_rows(patterns, lam, m, u),
        schema=", ".join(f"{c} int" for c in gcols)
        + ", __pm double, __pu double, match_weight double,"
        + " match_probability double",
    )
    scored = vectors.join(F.broadcast(wtab), gcols)
    if not tf_adjust:
        return scored.drop("__pm", "__pu")

    by_name = {c.name: (j, c) for j, c in enumerate(comparisons)}
    seen = set()
    adj_terms: list[Column] = []
    factors: list[Column] = []
    tf_names: list[str] = []
    for adj in tf_adjust:
        if adj.comparison not in by_name:
            raise ValueError(
                f"tf adjustment names unknown comparison {adj.comparison!r}"
            )
        if adj.comparison in seen:
            raise ValueError(f"duplicate tf adjustment for {adj.comparison!r}")
        seen.add(adj.comparison)
        if adj.value_col not in vectors.columns:
            raise ValueError(
                f"tf adjustment value_col {adj.value_col!r} not in vectors "
                f"{vectors.columns} — pass it through comparison_vectors"
                "(keep_cols=...)"
            )
        if not (tf_tables and adj.comparison in tf_tables):
            raise ValueError(
                f"no tf table for {adj.comparison!r}: pass tf_tables="
                "{name: term_frequencies(table, attr)}"
            )
        if not adj.weight > 0:
            raise ValueError(f"tf adjustment weight must be > 0; got {adj.weight}")
        j, comp = by_name[adj.comparison]
        top = comp.n_levels - 1
        u_top = u[j][top]
        tfv, tfc = f"__tfv_{adj.comparison}", f"__tf_{adj.comparison}"
        tft = tf_tables[adj.comparison].select(
            F.col("value").alias(tfv), F.col("tf").alias(tfc)
        )
        scored = scored.join(
            tft, scored[adj.value_col] == tft[tfv], "left"
        ).drop(tfv)
        # top level + a known tf => adjust; otherwise the neutral
        # no-op (0 added weight, 1.0 pu factor). A top-level value
        # absent from the tf corpus (two-table linkage where only one
        # side fed the tf table) falls back to the unadjusted u[top].
        hit = (F.col(f"gamma_{comp.name}") == top) & F.col(tfc).isNotNull()
        ratio = F.lit(u_top) / F.col(tfc)
        term = (
            F.lit(adj.weight) * F.log2(ratio)
            if adj.weight != 1.0
            else F.log2(ratio)
        )
        fac = (
            F.pow(F.col(tfc) / F.lit(u_top), F.lit(adj.weight))
            if adj.weight != 1.0
            else F.col(tfc) / F.lit(u_top)
        )
        contrib = F.when(hit, term).otherwise(F.lit(0.0))
        adj_terms.append(contrib)
        factors.append(F.when(hit, fac).otherwise(F.lit(1.0)))
        tf_names.append((adj.comparison, tfc, contrib))

    w_adj = F.col("match_weight")
    for t in adj_terms:
        w_adj = w_adj + t
    factor = factors[0]
    for f in factors[1:]:
        factor = factor * f
    prob_adj = F.col("__pm") / (F.col("__pm") + F.col("__pu") * factor)
    out = scored.withColumns(
        {
            # the diagnostic column IS the applied term (multiplier
            # included), so base_weight + sum(tf_weight_*) always
            # reconstructs the emitted match_weight exactly
            **{f"tf_weight_{name}": contrib for name, _, contrib in tf_names},
            "match_weight": w_adj,
            "match_probability": prob_adj,
        }
    )
    return out.drop("__pm", "__pu", *[tfc for _, tfc, _ in tf_names])


def score_with_params(
    vectors: DataFrame,
    comparisons: list[Comparison],
    params: dict,
    tf_adjust: list[TfAdjustment] = (),
    tf_tables: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Score pairs with EXPLICIT parameters — no EM. ``params`` is the
    dict :func:`fellegi_sunter` returns (``lambda``/``m``/``u`` keyed
    by comparison name), so a model fit once can score any later
    batch; hand-specified parameters (expert priors, a Splink export)
    work the same. The weight table enumerates the FULL level product
    (at most prod(levels) rows), so unseen patterns still score."""
    lam = params["lambda"]
    if not (0 < lam < 1):
        raise ValueError(f"lambda must be in (0,1); got {lam}")
    m, u = [], []
    for c in comparisons:
        for key in ("m", "u"):
            if c.name not in params[key]:
                raise ValueError(f"params[{key!r}] missing comparison {c.name!r}")
            got = len(params[key][c.name])
            if got != c.n_levels:
                raise ValueError(
                    f"params[{key!r}][{c.name!r}] has {got} levels; "
                    f"comparison declares {c.n_levels}"
                )
        m.append([float(x) for x in params["m"][c.name]])
        u.append([float(x) for x in params["u"][c.name]])
    for probs in itertools.chain(m, u):
        if any(not (0 < p < 1) for p in probs):
            raise ValueError(f"m/u probabilities must be in (0,1); got {probs}")
    gcols = [f"gamma_{c.name}" for c in comparisons]
    for c in gcols:
        if c not in vectors.columns:
            raise ValueError(f"column {c!r} not in vectors {vectors.columns}")
    patterns = list(itertools.product(*[range(c.n_levels) for c in comparisons]))
    return _attach_scores(
        vectors, comparisons, lam, m, u, patterns, tf_adjust, tf_tables
    )


def fellegi_sunter(
    vectors: DataFrame,
    comparisons: list[Comparison],
    max_iter: int = 25,
    initial_lambda: float = 0.1,
    tf_adjust: list[TfAdjustment] = (),
    tf_tables: dict[str, DataFrame] | None = None,
) -> tuple[DataFrame, dict]:
    """Fit the FS mixture by EM over the gamma-pattern histogram and
    score every pair.

    Returns ``(scored, params)``: ``scored`` = the input vectors plus
    ``match_weight`` (log2 likelihood ratio) and
    ``match_probability``; ``params`` = ``{"lambda": float,
    "m": {name: [..]}, "u": {name: [..]}, "patterns": int}`` for
    inspection and tests. The per-pattern weights are attached via a
    broadcast join on the gamma columns (the weight table is at most
    prod(levels) rows).

    ``tf_adjust``/``tf_tables`` apply :class:`TfAdjustment`
    term-frequency corrections at SCORING time; EM itself fits the
    unadjusted model (the standard order — Splink does the same: fit
    m/u globally, then adjust per-value evidence)."""
    if not (0 < initial_lambda < 1):
        raise ValueError(f"initial_lambda must be in (0,1); got {initial_lambda}")
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1; got {max_iter}")
    gcols = [f"gamma_{c.name}" for c in comparisons]
    for c in gcols:
        if c not in vectors.columns:
            raise ValueError(f"column {c!r} not in vectors {vectors.columns}")
    hist = gamma_histogram(vectors, gcols).collect()
    if not hist:
        raise ValueError("no pairs to fit on")
    for r in hist:
        for c in gcols:
            if r[c] is None:
                raise ValueError(
                    f"{c} contains NULL: every Comparison level_expr must "
                    "map every input (nulls included) to a level — end the "
                    "when-chain with .otherwise(0)"
                )
    patterns = sorted(
        (tuple(int(r[c]) for c in gcols), int(r["n"])) for r in hist
    )
    n_levels = [c.n_levels for c in comparisons]
    for g, _ in patterns:
        for j, lv in enumerate(g):
            if not (0 <= lv < n_levels[j]):
                raise ValueError(
                    f"gamma level {lv} out of range for comparison "
                    f"{comparisons[j].name!r} (n_levels={n_levels[j]})"
                )
    lam, m, u = _em(patterns, n_levels, max_iter, initial_lambda)
    scored = _attach_scores(
        vectors, comparisons, lam, m, u, [g for g, _ in patterns],
        tf_adjust, tf_tables,
    )
    params = {
        "lambda": lam,
        "m": {c.name: m[j] for j, c in enumerate(comparisons)},
        "u": {c.name: u[j] for j, c in enumerate(comparisons)},
        "patterns": len(patterns),
    }
    return scored, params


def sampled_pairs(
    records: DataFrame,
    key_attr: str,
    target_pairs: int = 100_000,
    seed: int = 42,
    n_records: int | None = None,
) -> DataFrame:
    """Deterministic pseudo-random record pairs from the FULL
    comparison space — ``(l_id, r_id)`` with l < r, no blocking.

    Records are hashed into B = max(1, C(n,2) // target_pairs)
    buckets by ``xxhash64(key, seed)`` and paired WITHIN buckets: one
    equi-join shuffle, expected yield ≈ ``target_pairs``, and because
    bucket assignment ignores every non-key attribute the sample is
    unbiased w.r.t. record content — the property u-estimation needs.
    Deterministic across partitionings and re-runs (hash of the key,
    no RNG state). ``n_records`` skips the count probe when the
    caller already knows it — it must be the count of records with a
    NON-NULL ``key_attr`` (null-keyed records cannot be paired and are
    excluded before bucketing; sizing the buckets from the raw row
    count would undershoot the yield quadratically on corpora with
    many null keys).
    """
    if target_pairs < 1:
        raise ValueError(f"target_pairs must be >= 1, got {target_pairs}")
    k = F.col(key_attr)
    keyed = records.where(k.isNotNull())
    n = int(n_records) if n_records is not None else keyed.count()
    if n < 2:
        raise ValueError(f"need >= 2 non-null-key records to sample pairs, got {n}")
    space = n * (n - 1) // 2
    n_buckets = max(1, space // int(target_pairs))
    b = keyed.select(
        k.alias("__k"),
        F.pmod(F.xxhash64(k, F.lit(int(seed))), F.lit(n_buckets)).alias("__b"),
    )
    lhs = b.select(F.col("__k").alias("l_id"), "__b")
    rhs = b.select(F.col("__k").alias("r_id"), "__b")
    return (
        lhs.join(rhs, "__b")
        .where(F.col("l_id") < F.col("r_id"))
        .select("l_id", "r_id")
    )


def estimate_u(
    records: DataFrame,
    key_attr: str,
    comparisons: list[Comparison],
    target_pairs: int = 100_000,
    seed: int = 42,
    smoothing: float = 0.5,
) -> tuple[dict[str, list[float]], int]:
    """Estimate non-match probabilities u from random pairs (Splink's
    ``estimate_u_using_random_sampling``; Winkler's standard
    shortcut): at realistic match prevalence, almost every random
    pair is a non-match, so the level frequencies of gamma over
    :func:`sampled_pairs` estimate u directly — no labels, no EM.

    Returns ``(u, n_pairs)`` with ``u`` keyed by comparison name,
    ready to drop into :func:`score_with_params`' ``params['u']`` or
    to seed :func:`fellegi_sunter`'s EM. ``smoothing`` is add-k over
    the levels so no level is exactly 0/1 (``score_with_params``
    rejects degenerate probabilities); with ``smoothing=0`` the
    returned values are additionally clamped into ``[EPS, 1-EPS]``
    (the same guard :func:`fellegi_sunter`'s EM applies) so the
    drop-in contract holds even when an unseen level's raw frequency
    is exactly zero.

    Cost: the bucket equi-join + ONE K-column aggregation whose
    output is K rows of level-count arrays — the per-comparison
    marginals, not the joint histogram, so the collect is K rows at
    any corpus size.
    """
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    pairs = sampled_pairs(records, key_attr, target_pairs, seed)
    vec = comparison_vectors(
        pairs, records, records, key_attr, key_attr, comparisons
    )
    # one aggregate: per comparison, the level-count array
    aggs = []
    for c in comparisons:
        g = F.col(f"gamma_{c.name}")
        aggs.append(
            F.array(*[
                F.count(F.when(g == lv, 1)).cast("long")
                for lv in range(c.n_levels)
            ]).alias(c.name)
        )
    aggs.append(F.count(F.lit(1)).alias("__n"))
    row = vec.agg(*aggs).collect()[0]
    n_pairs = int(row["__n"])
    if n_pairs == 0:
        raise ValueError("sampled 0 pairs — raise target_pairs")
    u: dict[str, list[float]] = {}
    for c in comparisons:
        counts = [int(x) for x in row[c.name]]
        denom = n_pairs + smoothing * c.n_levels
        # EPS clamp (same guard as _em): smoothing=0 with an unseen
        # level would otherwise emit exactly 0.0, which
        # score_with_params rejects — breaking the drop-in contract
        u[c.name] = [
            min(max((cnt + smoothing) / denom, EPS), 1 - EPS)
            for cnt in counts
        ]
    return u, n_pairs


def save_fs_params(params: dict, path: str) -> None:
    """Persist a fitted parameter dict (``fellegi_sunter``'s return /
    ``score_with_params``' input) as JSON — shortest-round-trip float
    repr, so :func:`load_fs_params` restores bit-identical doubles
    and re-scoring reproduces exactly."""
    import json

    with open(path, "w") as f:
        json.dump(params, f, indent=2, sort_keys=True)


def load_fs_params(path: str) -> dict:
    """Inverse of :func:`save_fs_params`."""
    import json

    with open(path) as f:
        params = json.load(f)
    for key in ("lambda", "m", "u"):
        if key not in params:
            raise ValueError(f"not an FS parameter file: missing {key!r}")
    return params
