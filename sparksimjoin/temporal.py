"""Temporal blocking over event/transcript streams: band self-join
(pairs within a time window) and gap sessionization.

The ``input_hint`` schema (BASELINE.json:15) carries a ``ts`` column;
records close in time are disproportionately likely to be the same
entity (retries, double-submits, crawl revisits), so a time window is
a first-class blocking key next to token blocking — upstream
py_stringsimjoin has no temporal operator, these extend the engine the
same way the dedup/ANN family does.

Scale design (the classic band-join decomposition — e.g. Blanas et
al., SIGMOD 2010's range-partitioned joins; Spark has no native band
join, a raw ``|l.ts - r.ts| <= W`` condition plans as a
BroadcastNestedLoopJoin):

- bucket every record at ``b = floor(unix_micros(ts) / W)``; two
  records within ``W`` are in the SAME or ADJACENT buckets, so the
  band join is (same-bucket pairs) UNION ALL (bucket b x bucket b+1
  pairs), both pure equi-joins, followed by the exact |delta| filter.
  Each qualifying unordered pair meets EXACTLY once (same-bucket join
  is key-ordered; the adjacent join is oriented low-bucket ->
  high-bucket), so there is no distinct/dedup shuffle.
- ``partition_attrs`` (e.g. user_id) ride along in the join key: the
  shuffle is on (partition, bucket), and the join is quadratic only
  within a (partition, bucket) cell — the caller controls cell size
  via the window. No pinned repartition, so AQE's skew-join splitting
  stays active for burst buckets.
- ``sessionize`` is one window function per partition key (lag ->
  session-break flag -> running sum); at 10^12 rows the shuffle is the
  unavoidable groupBy(user) co-location and nothing else.

Null ``ts``/key rows can never satisfy a window predicate; they are
excluded by semantics, and surfaced through ``metrics_out`` (house
"no silent caps" rule) rather than silently vanishing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .validation import validate_attr


def _micros(col: Column) -> Column:
    # TIMESTAMP_NTZ (what parquet scans commonly yield) is not
    # accepted by unix_micros; the cast shifts NTZ values by the
    # session timezone, which cancels in every use here — both
    # operators consume only DIFFERENCES of this expression
    return F.unix_micros(col.cast("timestamp"))


def time_band_pairs(
    df: DataFrame,
    key_attr: str,
    ts_attr: str,
    window_seconds: float,
    partition_attrs: list[str] | tuple[str, ...] = (),
    out_delta: str = "delta_us",
    metrics_out: dict | None = None,
) -> DataFrame:
    """All unordered record pairs with ``|ts_l - ts_r| <=
    window_seconds`` (inclusive), optionally restricted to equal
    ``partition_attrs`` (e.g. ``["user_id"]``) -> ``(l_id, r_id,
    delta_us)`` with ``l_id < r_id`` and ``delta_us`` the exact
    microsecond gap (bigint).

    Without ``partition_attrs`` the output is globally dense for
    windows larger than the stream's typical spacing — size the
    window accordingly (the same caveat as
    ``overlap_coefficient_join``'s scale warning).

    ``key_attr`` must uniquely identify records: the output space is
    ``(l_id, r_id)`` key pairs, so two distinct records sharing a key
    are indistinguishable downstream. Pairs with equal keys are
    therefore excluded in BOTH the same-bucket branch (``__lk <
    __rk``) and the adjacent-bucket branch (``__lk != __rk``) — with
    duplicate keys this drops genuine cross-record pairs rather than
    emitting a self-pair, which is the only consistent choice; dedupe
    or synthesize a unique key upstream if keys can repeat.
    """
    validate_attr(df, key_attr, "time_band_pairs")
    validate_attr(df, ts_attr, "time_band_pairs")
    for a in partition_attrs:
        validate_attr(df, a, "time_band_pairs")
    if not window_seconds > 0:
        raise ValueError(f"window_seconds must be > 0; got {window_seconds}")
    w_us = int(round(float(window_seconds) * 1_000_000))
    if w_us < 1:
        raise ValueError(
            f"window_seconds={window_seconds} rounds to < 1 microsecond"
        )
    parts = list(partition_attrs)
    usable = df.where(
        F.col(key_attr).isNotNull() & F.col(ts_attr).isNotNull()
    )
    for a in parts:
        usable = usable.where(F.col(a).isNotNull())
    if metrics_out is not None:
        from .joins.core import LazyCountMetric

        cond = F.col(key_attr).isNull() | F.col(ts_attr).isNull()
        for a in parts:
            cond = cond | F.col(a).isNull()
        metrics_out["null_dropped_records"] = LazyCountMetric(df.where(cond))

    base = usable.select(
        *parts,
        F.col(key_attr).alias("__k"),
        _micros(F.col(ts_attr)).alias("__t"),
    ).withColumn("__b", F.floor(F.col("__t") / F.lit(w_us)))

    left = base.select(
        *[F.col(a).alias(f"__p_{a}") for a in parts],
        F.col("__k").alias("__lk"), F.col("__t").alias("__lt"), "__b",
    )
    right_same = base.select(
        *[F.col(a).alias(f"__p_{a}") for a in parts],
        F.col("__k").alias("__rk"), F.col("__t").alias("__rt"), "__b",
    )
    # adjacent meet: the LOW-bucket record probes UP one bucket, so a
    # cross-bucket pair is produced exactly once, oriented
    # low-bucket -> high-bucket (then canonicalized by key below)
    right_next = right_same.withColumn("__b", F.col("__b") - F.lit(1))

    jk = [f"__p_{a}" for a in parts] + ["__b"]
    same = left.join(right_same, jk).where(F.col("__lk") < F.col("__rk"))
    # a single record occupies exactly one bucket, so the only way the
    # adjacent branch can produce __lk == __rk is duplicate keys in
    # neighbouring buckets — never a genuine self-pair; drop them (see
    # docstring's duplicate-key contract)
    adj = left.join(right_next, jk).where(F.col("__lk") != F.col("__rk"))
    pairs = same.unionByName(adj)

    delta = F.abs(F.col("__lt") - F.col("__rt"))
    return (
        pairs.where(delta <= F.lit(w_us))
        .select(
            F.least("__lk", "__rk").alias("l_id"),
            F.greatest("__lk", "__rk").alias("r_id"),
            delta.cast("bigint").alias(out_delta),
        )
    )


def sessionize(
    df: DataFrame,
    partition_attr: str,
    ts_attr: str,
    gap_seconds: float,
    session_attr: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: within each ``partition_attr`` group
    (ordered by ``ts_attr``), a record starts a NEW session iff it is
    the group's first record or follows its predecessor by MORE than
    ``gap_seconds``. Appends ``session_attr`` =
    ``'<partition>#<n>'`` (1-based per partition, deterministic) to
    the input columns; null-partition/null-ts rows get a NULL session.

    Ties on ``ts_attr`` are broken by the full ordering
    (ts, then every remaining column is NOT consulted — equal
    timestamps land in the same session by construction, since their
    gap is 0).
    """
    from pyspark.sql import Window

    validate_attr(df, partition_attr, "sessionize")
    validate_attr(df, ts_attr, "sessionize")
    if not gap_seconds > 0:
        raise ValueError(f"gap_seconds must be > 0; got {gap_seconds}")
    if session_attr in df.columns:
        raise ValueError(f"output column {session_attr!r} already in input")
    g_us = int(round(float(gap_seconds) * 1_000_000))
    # nulls-first EXPLICITLY (and brk gated on a non-null current ts):
    # null-ts rows then all precede the real stream, contribute no
    # session break, and consume no session number — they'd otherwise
    # occupy slot 1 and shift every real session id
    w = Window.partitionBy(partition_attr).orderBy(
        F.col(ts_attr).asc_nulls_first()
    )
    t = _micros(F.col(ts_attr))
    prev = F.lag(t).over(w)
    brk = F.when(
        t.isNotNull() & (prev.isNull() | ((t - prev) > F.lit(g_us))),
        F.lit(1),
    ).otherwise(F.lit(0))
    sid = F.concat(
        F.col(partition_attr).cast("string"), F.lit("#"),
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("string"),
    )
    out = df.withColumn(
        session_attr,
        F.when(
            F.col(partition_attr).isNotNull() & F.col(ts_attr).isNotNull(),
            sid,
        ),
    )
    return out
