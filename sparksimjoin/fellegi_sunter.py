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
) -> DataFrame:
    """Join the candidate pairs to both records and evaluate every
    comparison: output ``(l_id, r_id, gamma_<name>...)``. Column-expr
    only; the two prep joins are plain equi-joins on the keys."""
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
        *[F.col(c).alias(a) for c, a in l_names.items()],
    )
    rt = rtable.select(
        F.col(r_key_attr).alias(r_pair_col),
        *[F.col(c).alias(a) for c, a in r_names.items()],
    )
    joined = pairs.select(l_pair_col, r_pair_col).join(lt, l_pair_col).join(
        rt, r_pair_col
    )
    return joined.select(
        l_pair_col, r_pair_col,
        *[c.level_expr.cast("int").alias(f"gamma_{c.name}") for c in comparisons],
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


def fellegi_sunter(
    vectors: DataFrame,
    comparisons: list[Comparison],
    max_iter: int = 25,
    initial_lambda: float = 0.1,
) -> tuple[DataFrame, dict]:
    """Fit the FS mixture by EM over the gamma-pattern histogram and
    score every pair.

    Returns ``(scored, params)``: ``scored`` = the input vectors plus
    ``match_weight`` (log2 likelihood ratio) and
    ``match_probability``; ``params`` = ``{"lambda": float,
    "m": {name: [..]}, "u": {name: [..]}, "patterns": int}`` for
    inspection and tests. The per-pattern weights are attached via a
    broadcast join on the gamma columns (the weight table is at most
    prod(levels) rows)."""
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

    rows = []
    for g, _ in patterns:
        pm, pu = lam, 1.0 - lam
        w = 0.0
        for j, lv in enumerate(g):
            pm *= m[j][lv]
            pu *= u[j][lv]
            w += math.log2(m[j][lv] / u[j][lv])
        prob = pm / (pm + pu)
        rows.append((*g, w, prob))
    spark = vectors.sparkSession
    wtab = spark.createDataFrame(
        rows, schema=", ".join([f"{c} int" for c in gcols])
        + ", match_weight double, match_probability double",
    )
    scored = vectors.join(F.broadcast(wtab), gcols)
    params = {
        "lambda": lam,
        "m": {c.name: m[j] for j, c in enumerate(comparisons)},
        "u": {c.name: u[j] for j, c in enumerate(comparisons)},
        "patterns": len(patterns),
    }
    return scored, params
