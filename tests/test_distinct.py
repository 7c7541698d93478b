"""Mergeable HLL distinct tiers (operators/distinct.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from olympian_spark.operators.distinct import (
    distinct_coarser,
    distinct_rollup,
    with_distinct_estimate,
)


def _mk_events(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, user_id long")


BASE = dt.datetime(2024, 3, 1, 0, 0, 0)


def test_small_cardinalities_are_exact(spark):
    # sparse-mode HLL returns exact counts at tiny cardinalities — a
    # deterministic correctness anchor below the error-bound regime
    rows = []
    for h in range(3):
        for u in range(5 * (h + 1)):
            for rep in range(3):  # duplicates must not inflate
                rows.append((BASE + dt.timedelta(hours=h, seconds=u * 7 + rep), u))
    tier = with_distinct_estimate(
        distinct_rollup(_mk_events(spark, rows), "user_id", grain="hour")
    )
    got = {r.bucket_start.hour: (r.n_rows, r.n_distinct) for r in tier.collect()}
    assert got == {0: (15, 5), 1: (30, 10), 2: (45, 15)}


def test_cascade_is_path_independent(spark):
    rows = [
        (BASE + dt.timedelta(minutes=m, seconds=s), (m * 131 + s) % 200)
        for m in range(0, 180, 7)
        for s in range(0, 50, 3)
    ]
    ev = _mk_events(spark, rows)
    t1m = distinct_rollup(ev, "user_id", grain="minute")
    via_hour = distinct_coarser(distinct_coarser(t1m, "hour"), "day")
    direct = distinct_coarser(t1m, "day")
    a = with_distinct_estimate(via_hour).select("bucket_start", "n_rows", "n_distinct")
    b = with_distinct_estimate(direct).select("bucket_start", "n_rows", "n_distinct")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # and the day tier agrees with a from-scratch day rollup
    scratch = with_distinct_estimate(distinct_rollup(ev, "user_id", grain="day"))
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, scratch.select("bucket_start", "n_rows", "n_distinct").collect())
    )


def test_estimate_within_bound_at_larger_cardinality(spark):
    # 20k distinct keys in one bucket: lg_k=12 → rse ≈ 1.6%; assert 5σ
    n = 20_000
    df = spark.range(n).select(
        F.lit(BASE).cast("timestamp").alias("ts"), F.col("id").alias("user_id")
    )
    est = with_distinct_estimate(
        distinct_rollup(df, "user_id", grain="day")
    ).collect()[0]
    assert est.n_rows == n
    assert abs(est.n_distinct - n) / n < 5 * 1.04 / (2**12) ** 0.5


def test_dims_and_union_requires_same_lg_k(spark):
    rows = [(BASE, 1), (BASE, 2), (BASE + dt.timedelta(days=1), 1)]
    df = _mk_events(spark, rows).withColumn(
        "region", (F.col("user_id") % 2).cast("string")
    )
    tier = with_distinct_estimate(
        distinct_rollup(df, "user_id", grain="day", dims=["region"])
    )
    got = {(r.region, r.bucket_start.day): r.n_distinct for r in tier.collect()}
    assert got == {("1", 1): 1, ("0", 1): 1, ("1", 2): 1}
    # mismatched lg_k across tiers must fail loudly, not merge silently
    a = distinct_rollup(_mk_events(spark, rows), "user_id", grain="hour", lg_k=11)
    b = distinct_rollup(_mk_events(spark, rows), "user_id", grain="hour", lg_k=12)
    with pytest.raises(Exception):
        distinct_coarser(a.union(b), "day").collect()


def test_shuffle_carries_sketches_not_rows(spark):
    """Plan shape: the tier aggregate must partially aggregate BEFORE the
    exchange (map-side combine), so shuffle volume is per-bucket sketches,
    not per-row keys."""
    df = spark.range(10_000).select(
        F.lit(BASE).cast("timestamp").alias("ts"), (F.col("id") % 97).alias("user_id")
    )
    plan = distinct_rollup(df, "user_id", grain="minute")._jdf.queryExecution(
    ).executedPlan().toString()
    # partial HLL aggregate appears below the exchange
    before_exchange = plan.split("Exchange")[-1]
    assert "hll_sketch_agg" in before_exchange
