"""Interval join (bucketed band join) + rolling z-score / EWMA."""

import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F

from olympian_spark.operators.intervals import interval_join
from olympian_spark.operators.window_stats import ewma, rolling_zscore

BASE = dt.datetime(2024, 3, 1, 0, 0, 0)


def _brute_interval_join(events, intervals, end_inclusive=False):
    out = []
    for ets, eid in events:
        for ws, we, wid in intervals:
            if ets >= ws and (ets <= we if end_inclusive else ets < we):
                out.append((eid, wid))
    return sorted(out)


def test_interval_join_matches_brute_force(spark):
    rng = np.random.default_rng(7)
    events = [
        (BASE + dt.timedelta(seconds=int(s)), i)
        for i, s in enumerate(rng.integers(0, 72 * 3600, 400))
    ]
    intervals = []
    for j in range(40):
        s = BASE + dt.timedelta(seconds=int(rng.integers(0, 70 * 3600)))
        e = s + dt.timedelta(seconds=int(rng.integers(1, 8 * 3600)))
        intervals.append((s, e, j))
    ev = spark.createDataFrame(events, "ts timestamp, event_id long")
    iv = spark.createDataFrame(intervals, "w_start timestamp, w_end timestamp, w_id long")
    for grain in ("minute", "hour", "day"):
        got = sorted(
            (r.event_id, r.w_id)
            for r in interval_join(ev, iv, grain=grain).collect()
        )
        assert got == _brute_interval_join(events, intervals)
    # inclusive end: place an event exactly on an interval end
    ev2 = spark.createDataFrame(
        [(intervals[0][1], 999)], "ts timestamp, event_id long"
    )
    assert interval_join(ev2, iv, grain="hour").where("w_id = 0").count() == 0
    got_inc = interval_join(ev2, iv, grain="hour", end_inclusive=True)
    assert got_inc.where("w_id = 0").count() == 1


def test_interval_join_is_equi_join_not_nested_loop(spark):
    ev = spark.range(1000).select(
        F.timestamp_seconds(F.lit(1709251200) + F.col("id")).alias("ts"),
        F.col("id").alias("event_id"),
    )
    iv = spark.createDataFrame(
        [(BASE, BASE + dt.timedelta(hours=1), 0)],
        "w_start timestamp, w_end timestamp, w_id long",
    )
    plan = interval_join(ev, iv)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def _zscore_ref(rows, window_s, min_periods):
    # rows: (ts, user, value) — trailing inclusive window per user
    out = {}
    for ts, u, v in rows:
        win = [w for t2, u2, w in rows if u2 == u and 0 <= (ts - t2).total_seconds() <= window_s]
        n = len(win)
        if n < min_periods:
            out[(u, ts)] = None
            continue
        mean = sum(win) / n
        var = (sum(x * x for x in win) - sum(win) ** 2 / n) / (n - 1)
        out[(u, ts)] = math.floor((v - mean) / math.sqrt(var) * 1e6) if var > 0 else None
    return out


def test_rolling_zscore_matches_reference(spark):
    rng = np.random.default_rng(3)
    rows = [
        (BASE + dt.timedelta(seconds=int(s)), int(u), float(v))
        for s, u, v in zip(
            rng.integers(0, 7200, 300), rng.integers(0, 4, 300),
            rng.integers(1, 500, 300),
        )
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    got = {
        (r.user_id, r.ts): r.zscore_x1e6
        for r in rolling_zscore(df, "value", window_s=600, min_periods=5).collect()
    }
    assert got == _zscore_ref(rows, 600, 5)


def test_ewma_head_and_steady_state(spark):
    # constant series -> ewma == the constant exactly, from row 0
    rows = [(BASE + dt.timedelta(seconds=i), 0, 42.0) for i in range(30)]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    vals = [r.ewma_x1e6 for r in ewma(df, "value").orderBy("ts").collect()]
    # floor(1e6 * num/den) can land one ulp under the constant — the
    # convention trades that for exact cross-engine comparability
    assert all(abs(v - 42_000_000) <= 1 for v in vals)
    # reference check against pandas ewm on a random series (truncated
    # window: compare where >= `window` points exist so tails agree)
    import pandas as pd

    rng = np.random.default_rng(5)
    xs = rng.integers(1, 100, 64).astype(float)
    rows = [(BASE + dt.timedelta(seconds=i), 0, float(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    got = [r.ewma_x1e6 / 1e6 for r in ewma(df, "value", alpha=0.3, window=16).orderBy("ts").collect()]
    ref = pd.Series(xs).ewm(alpha=0.3, adjust=True).mean().tolist()
    for i in range(16, 64):
        assert abs(got[i] - ref[i]) < 0.05 * abs(ref[i]) + 1e-6  # 0.7^16 tail


def test_window_ops_single_exchange(spark):
    df = spark.range(100).select(
        F.timestamp_seconds(F.lit(1709251200) + F.col("id")).alias("ts"),
        (F.col("id") % 5).alias("user_id"),
        F.col("id").cast("double").alias("value"),
    )
    for op in (rolling_zscore, ewma):
        plan = op(df, "value")._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
