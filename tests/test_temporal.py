"""time_band_pairs / sessionize (sparksimjoin/temporal.py):
brute-force parity including exact-boundary and adjacent-bucket
meetings, meet-exactly-once (no dedup shuffle needed), equi-join-only
plan shape, and sessionization vs a pure-Python twin."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparksimjoin.temporal import sessionize, time_band_pairs

T0 = dt.datetime(2024, 1, 1)


def _ts(sec, micros=0):
    return T0 + dt.timedelta(seconds=sec, microseconds=micros)


def _events(spark):
    """Hand-built stream exercising every band edge: same-bucket,
    adjacent-bucket, exact |delta| == W (IN), |delta| == W + 1us
    (OUT), cross-user suppression, null ts/key."""
    rows = [
        # user 1: a cluster around t=0..90s
        (10, 1, _ts(0)),
        (11, 1, _ts(30)),
        (12, 1, _ts(90)),            # 90s from 10: in iff W >= 90
        (13, 1, _ts(60, 1)),         # 60.000001s from 10
        # user 1: far away
        (14, 1, _ts(10_000)),
        # user 2: same timestamps as user 1 — must NOT pair across
        (20, 2, _ts(0)),
        (21, 2, _ts(30)),
        # exact boundary pair: delta == W exactly (W=60s below)
        (30, 3, _ts(500)),
        (31, 3, _ts(560)),           # 60.000000s -> IN (inclusive)
        (32, 3, _ts(560, 1)),        # 60.000001s from 30 -> OUT
        # nulls
        (40, 4, None),
        (None, 4, _ts(5)),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def _brute(rows, w_us, by_user=True):
    out = {}
    rs = [(k, u, t) for k, u, t in rows if k is not None and t is not None]
    for i in range(len(rs)):
        for j in range(i + 1, len(rs)):
            ka, ua, ta = rs[i]
            kb, ub, tb = rs[j]
            if by_user and ua != ub:
                continue
            d = abs(int((ta - tb).total_seconds() * 1_000_000))
            if d <= w_us:
                out[(min(ka, kb), max(ka, kb))] = d
    return out


def test_time_band_brute_force_and_boundaries(spark):
    df = _events(spark)
    rows = [(r.event_id, r.user_id, r.ts) for r in df.collect()]
    for w in (60.0, 90.0, 31.0):
        got = {(r.l_id, r.r_id): r.delta_us
               for r in time_band_pairs(
                   df, "event_id", "ts", w, ["user_id"]).collect()}
        assert got == _brute(rows, int(w * 1_000_000)), w
    # inclusive boundary explicitly: (30,31) at exactly 60s
    got60 = {(r.l_id, r.r_id)
             for r in time_band_pairs(
                 df, "event_id", "ts", 60, ["user_id"]).collect()}
    assert (30, 31) in got60
    assert (30, 32) not in got60       # 60s + 1us
    assert (20, 21) in got60 and (10, 20) not in got60  # user-partitioned


def test_time_band_meets_exactly_once(spark):
    """No distinct/dedup anywhere in the operator — each qualifying
    pair must be produced exactly once by construction (same-bucket
    key-ordered + low->high adjacent probe)."""
    df = _events(spark)
    out = time_band_pairs(df, "event_id", "ts", 90, ["user_id"])
    pairs = [(r.l_id, r.r_id) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    # and a timestamp EXACTLY on a bucket edge still meets once
    edge = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(60))],  # t=60s == bucket boundary at W=60
        "event_id long, user_id long, ts timestamp")
    got = [(r.l_id, r.r_id, r.delta_us)
           for r in time_band_pairs(edge, "event_id", "ts", 60, ["user_id"]).collect()]
    assert got == [(1, 2, 60_000_000)]


def test_time_band_global_and_metrics(spark):
    df = _events(spark)
    rows = [(r.event_id, r.user_id, r.ts) for r in df.collect()]
    metrics = {}
    got = {(r.l_id, r.r_id): r.delta_us
           for r in time_band_pairs(
               df, "event_id", "ts", 60, metrics_out=metrics).collect()}
    assert got == _brute(rows, 60_000_000, by_user=False)
    assert int(metrics["null_dropped_records"]) == 2  # null ts + null key


def test_time_band_partition_invariance(spark):
    df = _events(spark)
    a = sorted(map(tuple, time_band_pairs(
        df, "event_id", "ts", 90, ["user_id"]).collect()))
    b = sorted(map(tuple, time_band_pairs(
        df.repartition(7), "event_id", "ts", 90, ["user_id"]).collect()))
    assert a == b


def test_time_band_plan_is_equi_join_only(spark):
    """The whole point vs a raw range predicate: no
    BroadcastNestedLoopJoin / CartesianProduct in the plan."""
    df = _events(spark)
    plan = time_band_pairs(
        df, "event_id", "ts", 60, ["user_id"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_time_band_validation(spark):
    df = _events(spark)
    with pytest.raises(ValueError, match="window_seconds"):
        time_band_pairs(df, "event_id", "ts", 0)
    with pytest.raises(AssertionError):
        time_band_pairs(df, "nope", "ts", 60)


def _session_brute(rows, gap_us):
    """Pure-Python twin: per user, ts-ascending, new session when the
    gap exceeds gap_us."""
    out = {}
    by_u = {}
    for k, u, t in rows:
        if u is None or t is None:
            out[k] = None
            continue
        by_u.setdefault(u, []).append((t, k))
    for u, evs in by_u.items():
        evs.sort()
        n = 0
        prev = None
        for t, k in evs:
            if prev is None or (t - prev).total_seconds() * 1_000_000 > gap_us:
                n += 1
            out[k] = f"{u}#{n}"
            prev = t
    return out


def test_sessionize_brute_force(spark):
    rows = [
        (1, 1, _ts(0)), (2, 1, _ts(100)), (3, 1, _ts(5000)),
        (4, 1, _ts(5100, 1)),          # 100.000001s after 3
        (5, 2, _ts(0)), (6, 2, _ts(101)),   # gap > 100s -> new session
        (7, None, _ts(0)), (8, 2, None),    # null partition / ts
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r.event_id: r.session_id
           for r in sessionize(df, "user_id", "ts", 100).collect()}
    assert out == _session_brute(rows, 100_000_000)
    # boundary: gap EXACTLY 100s stays in-session (strictly-greater breaks)
    assert out[2] == out[1]
    assert out[4] != out[3]
    assert out[6] != out[5]
    assert out[7] is None and out[8] is None


def test_sessionize_equal_timestamps_single_session(spark):
    rows = [(i, 9, _ts(42)) for i in range(5)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    sids = {r.session_id for r in sessionize(df, "user_id", "ts", 1).collect()}
    assert sids == {"9#1"}


def test_sessionize_validation(spark):
    df = _events(spark)
    with pytest.raises(ValueError, match="gap_seconds"):
        sessionize(df, "user_id", "ts", 0)
    with pytest.raises(ValueError, match="already in input"):
        sessionize(df.withColumn("session_id", F.lit("x")),
                   "user_id", "ts", 10)


def test_time_band_duplicate_keys_never_self_pair(spark):
    """key_attr uniqueness contract: duplicate keys must never
    surface as self-pairs (l_id == r_id). Two records sharing key=1
    land in ADJACENT buckets (t=0s and t=70s, W=60) — without the
    adjacent-branch __lk != __rk guard this emitted (1, 1). Equal-key
    pairs are excluded in both branches by the documented contract;
    distinct-key pairs are unaffected."""
    df = spark.createDataFrame(
        [(1, 1, _ts(0)), (1, 1, _ts(70)), (2, 1, _ts(30))],
        "event_id long, user_id long, ts timestamp",
    )
    got = [(r.l_id, r.r_id) for r in time_band_pairs(
        df, "event_id", "ts", 60, ["user_id"]).collect()]
    assert all(l != r for l, r in got)
    # the distinct-key pairs survive: key 2 within 60s of both key-1 rows
    assert sorted(got) == [(1, 2), (1, 2)]
