"""M4 downsampling + interval coalescing."""

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from olympian_spark.operators.downsample import m4_downsample
from olympian_spark.operators.intervals import coalesce_intervals

BASE = dt.datetime(2024, 3, 1, 0, 0, 0)


def test_m4_matches_reference(spark):
    rng = np.random.default_rng(9)
    rows = [
        (BASE + dt.timedelta(seconds=int(s)), int(u), float(v))
        for s, u, v in zip(
            rng.choice(14_400, 500, replace=False),  # unique ts -> tie-free
            rng.integers(0, 3, 500),
            rng.integers(-50, 500, 500),
        )
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    got = {
        (r.user_id, r.bucket_start): (
            r.n, r.v_min, r.v_max, r.v_first, r.v_last, r.ts_first, r.ts_last
        )
        for r in m4_downsample(df, "value", bucket_s=3600).collect()
    }
    ref = {}
    for ts, u, v in rows:
        b = BASE + dt.timedelta(hours=int((ts - BASE).total_seconds() // 3600))
        ref.setdefault((u, b), []).append((ts, v))
    for k, pts in ref.items():
        pts.sort()
        vs = [v for _, v in pts]
        expect = (
            len(pts), min(vs), max(vs), pts[0][1], pts[-1][1],
            pts[0][0], pts[-1][0],
        )
        assert got[k] == expect, (k, got[k], expect)
    assert set(got) == set(ref)


def test_m4_is_single_shuffle_no_sort_node(spark):
    df = spark.range(1000).select(
        F.timestamp_seconds(F.lit(1709251200) + F.col("id")).alias("ts"),
        (F.col("id") % 7).alias("user_id"),
        F.col("id").cast("double").alias("value"),
    )
    plan = m4_downsample(df, "value")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Window" not in plan


def _brute_islands(intervals):
    # intervals: (key, start, end) ints; returns {(key, start, end, n)}
    out = set()
    bykey = {}
    for k, s, e in intervals:
        bykey.setdefault(k, []).append((s, e))
    for k, ivs in bykey.items():
        ivs.sort()
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s > cur_e:
                out.add((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        out.add((k, cur_s, cur_e, n))
    return out


def test_coalesce_intervals_matches_brute_force(spark):
    rng = np.random.default_rng(21)
    ivs = []
    for _ in range(300):
        s = int(rng.integers(0, 10_000))
        ivs.append((int(rng.integers(0, 5)), s, s + int(rng.integers(1, 800))))
    df = spark.createDataFrame(ivs, "key long, w_start long, w_end long")
    got = {
        (r.key, r.island_start, r.island_end, r.n_merged)
        for r in coalesce_intervals(df).collect()
    }
    assert got == _brute_islands(ivs)


def test_coalesce_nested_and_touching(spark):
    # nested interval must NOT split the island (lag(end)-based merges do);
    # touching intervals (half-open) must merge
    ivs = [
        ("a", 0, 100), ("a", 10, 20), ("a", 100, 150),  # one island 0..150
        ("a", 200, 210),
        ("b", 0, 50), ("b", 60, 70),
    ]
    df = spark.createDataFrame(ivs, "key string, w_start long, w_end long")
    got = {
        (r.key, r.island_start, r.island_end, r.n_merged)
        for r in coalesce_intervals(df).collect()
    }
    assert got == {
        ("a", 0, 150, 3), ("a", 200, 210, 1), ("b", 0, 50, 1), ("b", 60, 70, 1)
    }


def test_lttb_invariants(spark):
    """LTTB: exact output count, endpoints preserved, a dominant spike
    always selected, deterministic across repartitionings."""
    import numpy as np

    from olympian_spark.operators.downsample import lttb_downsample

    rng = np.random.default_rng(11)
    rows = []
    for s in ("s1", "s2"):
        base = rng.normal(0, 1, 500).cumsum()
        base[137] += 500.0  # dominant spike
        for i, v in enumerate(base):
            rows.append((s, 1_700_000_000_000_000 + i * 60_000_000, float(v)))
    df = spark.createDataFrame(rows, "user_id STRING, us BIGINT, value DOUBLE").selectExpr(
        "user_id", "timestamp_micros(us) AS ts", "value"
    )
    out = lttb_downsample(df, "value", by="user_id", n_out=50)
    pdf = out.toPandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    for s, g in pdf.groupby("user_id"):
        assert len(g) == 50
        assert g["ts"].is_monotonic_increasing
        # endpoints kept
        assert g["ts"].iloc[0] == pdf["ts"].min()
        # spike survives downsampling (LTTB's defining property)
        assert g["value"].max() > 400.0
    # n_out >= n passes everything through
    small = lttb_downsample(df.limit(10), "value", by="user_id", n_out=50)
    assert small.count() == 10
    # deterministic under repartitioning
    out2 = lttb_downsample(df.repartition(7), "value", by="user_id", n_out=50)
    a = sorted(map(tuple, pdf[["user_id", "ts", "value"]].itertuples(index=False)))
    b = sorted(map(tuple, out2.toPandas()[["user_id", "ts", "value"]].itertuples(index=False)))
    assert a == b
