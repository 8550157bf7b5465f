"""Canonicalization of linkage output: cluster representatives and
golden records.

After blocking + scoring + transitive clustering, an ER pipeline's
deliverable is usually not the cluster assignment itself but ONE
canonical row per entity. Two standard forms:

- ``cluster_representatives``: pick the MEDOID-like member — the
  record with the maximum total intra-cluster edge support (sum of
  its supporting match scores), ties broken by least record id;
  singletons represent themselves with support 0. The member whose
  string the rest of the cluster most agrees with — the natural
  "survivor" record for survivorship rules.

- ``golden_records``: per-attribute consolidation — for each cluster
  and each requested attribute, the modal (most frequent) non-null
  value, ties broken by least value. The classic "golden record"
  merge for conflicting sources.

Both are pure built-in DataFrame ops designed for 100 TB shapes:

- representative selection is ``min(struct(-support, id))`` — a HASH
  AGGREGATION with map-side partial combine, NOT a per-cluster window
  sort, so a pathological mega-cluster is one reduce key receiving
  pre-combined partials, never one task sorting its full membership;
- golden-record mode-picking is the same argmin-struct shape per
  attribute over ``(cluster, value)`` counts.

The reference stops at pairwise join output (no clustering, hence no
canonicalization — this extends the surface the north rule adds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def member_support(
    components: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    component_col: str = "component",
    l_col: str = "l_id",
    r_col: str = "r_id",
    score_col: str = "_sim_score",
    round_to: int | None = 6,
) -> DataFrame:
    """Per-member total intra-cluster edge support ->
    ``(component, id, support)`` with one row per labeled record
    (members with no intra-cluster edge get support 0.0).

    Edges whose endpoints carry DIFFERENT labels (possible when the
    edge set is foreign to the clustering) are ignored, matching
    ``cluster_audit``. ``round_to`` rounds the support sum so the
    value — and any argmax over it — is reproducible across summation
    orders (``None`` for raw doubles)."""
    lab = components.select(
        F.col(id_col).alias("__aid"), F.col(component_col).alias("__comp")
    )
    e = (
        edges.select(
            F.col(l_col).alias("__l"),
            F.col(r_col).alias("__r"),
            F.col(score_col).cast("double").alias("__s"),
        )
        .join(lab.withColumnRenamed("__aid", "__l"), "__l")
        .withColumnRenamed("__comp", "__lc")
        .join(lab.withColumnRenamed("__aid", "__r"), "__r")
        .where(F.col("__lc") == F.col("__comp"))
    )
    # symmetrize: each intra-cluster edge supports BOTH endpoints
    sym = e.select(F.col("__l").alias("__aid"), "__s").unionAll(
        e.select(F.col("__r").alias("__aid"), "__s")
    )
    per = sym.groupBy("__aid").agg(F.sum("__s").alias("__sup"))
    sup = F.coalesce("__sup", F.lit(0.0))
    if round_to is not None:
        sup = F.round(sup, round_to)
    return lab.join(per, "__aid", "left").select(
        F.col("__comp").alias(component_col),
        F.col("__aid").alias(id_col),
        sup.alias("support"),
    )


def cluster_representatives(
    components: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    component_col: str = "component",
    l_col: str = "l_id",
    r_col: str = "r_id",
    score_col: str = "_sim_score",
    round_to: int | None = 6,
) -> DataFrame:
    """One row per component: ``(component, rep_id, n_records,
    rep_support)`` — the representative member (module docstring).

    Selection is ``min(struct(-support, id))``: argmax support with
    least-id tie-break, as a plain aggregate (no window; the
    mega-cluster skew note in the module docstring). ``-support``
    negation is tie-safe: a 0.0 support negates to -0.0, and Spark
    SQL's comparison normalizes -0.0 == 0.0, so ties still fall
    through to the id."""
    ms = member_support(
        components, edges, id_col, component_col, l_col, r_col, score_col, round_to
    )
    picked = ms.groupBy(component_col).agg(
        F.min(
            F.struct(
                (-F.col("support")).alias("__negsup"), F.col(id_col).alias("__id")
            )
        ).alias("__best"),
        F.count(F.lit(1)).alias("n_records"),
    )
    return picked.select(
        component_col,
        F.col("__best.__id").alias("rep_id"),
        "n_records",
        (-F.col("__best.__negsup")).alias("rep_support"),
    )


def golden_records(
    components: DataFrame,
    records: DataFrame,
    id_col: str,
    attrs: list[str],
    component_col: str = "component",
) -> DataFrame:
    """Per-cluster modal consolidation -> one row per component:
    ``(component, n_records, <attr>...)`` where each attr carries the
    cluster's most frequent NON-NULL value (ties -> least value; all
    members null -> null).

    One ``groupBy(component, value)`` count + argmin-struct pick per
    attribute (each attribute may have a different type, so values are
    never unioned into one column) — k attributes cost k keyed
    aggregations over |V| rows, all map-side combinable."""
    lab = components.select(
        F.col(id_col).alias("__aid"), F.col(component_col).alias("__comp")
    )
    labeled = lab.join(
        records.select(F.col(id_col).alias("__aid"), *[F.col(a) for a in attrs]),
        "__aid",
    )
    out = lab.groupBy("__comp").agg(F.count(F.lit(1)).alias("n_records"))
    for a in attrs:
        counts = (
            labeled.where(F.col(a).isNotNull())
            .groupBy("__comp", a)
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        best = counts.groupBy("__comp").agg(
            F.min(
                F.struct((-F.col("__cnt")).alias("__negcnt"), F.col(a).alias("__v"))
            ).alias("__best")
        )
        out = out.join(
            best.select("__comp", F.col("__best.__v").alias(a)), "__comp", "left"
        )
    return out.select(F.col("__comp").alias(component_col), "n_records", *attrs)
