"""Tier B: Spark window-expression QC vs the NumPy oracle, bit-exact.

Randomized regular series with gap patterns (seeded) are run through both
the relational step/dip/flatline operators and the oracle; flags must match
exactly for every point, including the context-trim alignment.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from olympian_spark.flags import Flag
from olympian_spark.operators.qc_series import dip_flag, step_flag, with_flatline_flag
from olympian_spark.oracle import dip_check, flatline_check, step_check


def _random_series(rng, n, gap_p=0.2):
    vals = np.round(rng.normal(0, 5, size=n), 3).astype(np.float32)
    gaps = rng.random(n) < gap_p
    return [None if g else float(v) for v, g in zip(vals, gaps)]


@pytest.fixture(scope="module")
def series_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    series = {}
    for s in range(20):
        vals = _random_series(rng, int(rng.integers(5, 60)))
        series[f"s{s:03d}"] = vals
        for i, v in enumerate(vals):
            rows.append((f"s{s:03d}", i, v))
    df = spark.createDataFrame(rows, "series_id string, spine_idx long, value float")
    return df, series


HIGH, MAX = 3.0, 8.0


def test_step_matches_oracle(spark, series_df):
    df, series = series_df
    out = (
        df.withColumn("flag", step_flag("value", "series_id", "spine_idx", HIGH, MAX))
        .filter(F.col("spine_idx") >= 1)  # num_leading_points = 1
        .orderBy("series_id", "spine_idx")
        .collect()
    )
    got = {}
    for r in out:
        got.setdefault(r.series_id, []).append(r.flag)
    for sid, vals in series.items():
        expected = step_check(vals, num_leading_points=1, high=HIGH, max_=MAX)
        assert got[sid] == expected, f"step mismatch for {sid}"


def test_step_inverted_thresholds_fail_reachable(spark, series_df):
    """high > max_ makes FAIL reachable — exercises the Warn-before-Fail bug."""
    df, series = series_df
    out = (
        df.withColumn("flag", step_flag("value", "series_id", "spine_idx", 50.0, 2.0))
        .filter(F.col("spine_idx") >= 1)
        .orderBy("series_id", "spine_idx")
        .collect()
    )
    got = {}
    for r in out:
        got.setdefault(r.series_id, []).append(r.flag)
    any_fail = False
    for sid, vals in series.items():
        expected = step_check(vals, 1, 50.0, 2.0)
        assert got[sid] == expected
        any_fail |= int(Flag.FAIL) in expected
    assert any_fail, "fixture too tame: no FAIL produced"


def test_dip_matches_oracle(spark, series_df):
    df, series = series_df
    out = (
        df.withColumn("flag", dip_flag("value", "series_id", "spine_idx", HIGH, MAX))
        .withColumn("n", F.max("spine_idx").over(
            __import__("pyspark").sql.Window.partitionBy("series_id")))
        .filter((F.col("spine_idx") >= 1) & (F.col("spine_idx") < F.col("n")))
        .orderBy("series_id", "spine_idx")
        .collect()
    )
    got = {}
    for r in out:
        got.setdefault(r.series_id, []).append(r.flag)
    for sid, vals in series.items():
        expected = dip_check(vals, 1, 1, high=HIGH, max_=MAX)
        assert got[sid] == expected, f"dip mismatch for {sid}"


def test_flatline_matches_oracle(spark):
    rng = np.random.default_rng(11)
    rows, series = [], {}
    for s in range(15):
        n = int(rng.integers(5, 40))
        # runs of repeated values with gaps sprinkled in
        vals = []
        while len(vals) < n:
            v = float(np.float32(round(rng.normal(), 2)))
            run = int(rng.integers(1, 6))
            vals.extend([v] * run)
        vals = vals[:n]
        for i in rng.choice(n, size=max(1, n // 8), replace=False):
            vals[int(i)] = None
        series[f"f{s:03d}"] = vals
        rows.extend((f"f{s:03d}", i, v) for i, v in enumerate(vals))
    df = spark.createDataFrame(rows, "series_id string, spine_idx long, value float")
    out = (
        with_flatline_flag(df, "value", "series_id", "spine_idx", min_run=3)
        .orderBy("series_id", "spine_idx")
        .collect()
    )
    got = {}
    for r in out:
        got.setdefault(r.series_id, []).append(r.flag_flatline)
    for sid, vals in series.items():
        assert got[sid] == flatline_check(vals, min_run=3), f"flatline mismatch {sid}"


def test_nan_semantics(spark):
    """Rust f32: every NaN comparison is false -> step/dip PASS on NaN windows."""
    vals = [1.0, float("nan"), 1.0, 50.0, 1.0]
    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(vals)],
        "series_id string, spine_idx long, value float",
    )
    out = (
        df.withColumn("f", step_flag("value", "series_id", "spine_idx", HIGH, MAX))
        .filter(F.col("spine_idx") >= 1)
        .orderBy("spine_idx")
        .collect()
    )
    assert [r.f for r in out] == step_check(vals, 1, HIGH, MAX)


def test_gap_and_dip_parallel_matches_window_path(spark):
    """The range-sort + boundary-stitch stage-1 (with_gap_and_dip_parallel)
    must reproduce the window formulation's turn_gap_s and flag_dip exactly
    — including across partition seams (forced small n_part so many
    conversations straddle boundaries) and under conversation skew."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from olympian_spark.datagen import gen_transcripts
    from olympian_spark.operators.qc_series import (
        dip_flag,
        with_gap_and_dip_parallel,
    )

    pdf = gen_transcripts(
        n_turns=20_000, n_convs=30, seed=29, hot_conv_share=0.35
    ).to_pandas()
    df = spark.createDataFrame(pdf).select(
        "conv_id", "turn_idx", "ts",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("float").alias("text_len"),
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = F.col("ts").cast("timestamp")
    ref = df.withColumn(
        "turn_gap_s",
        ((F.unix_micros(t) - F.unix_micros(F.lag(t).over(w))).cast("double") / 1e6)
        .cast("float"),
    ).withColumn("flag_dip", dip_flag("turn_gap_s", "conv_id", "turn_idx", 300.0, 1200.0))

    got, handle = with_gap_and_dip_parallel(df, 300.0, 1200.0, n_part=11)
    a = ref.select("conv_id", "turn_idx", "turn_gap_s", "flag_dip").orderBy(
        "conv_id", "turn_idx"
    ).collect()
    b = got.select("conv_id", "turn_idx", "turn_gap_s", "flag_dip").orderBy(
        "conv_id", "turn_idx"
    ).collect()
    handle.unpersist()
    assert len(a) == len(b) == 20_000
    for ra, rb in zip(a, b):
        assert (ra.conv_id, ra.turn_idx) == (rb.conv_id, rb.turn_idx)
        assert ra.flag_dip == rb.flag_dip, (ra, rb)
        ga, gb = ra.turn_gap_s, rb.turn_gap_s
        if ga is None:
            assert gb is None or np.isnan(gb)  # NULL <-> NaN carrier
        else:
            assert gb is not None and (
                np.float32(ga).view(np.uint32) == np.float32(gb).view(np.uint32)
            )
