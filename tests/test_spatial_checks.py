"""Spark grouped-kernel spatial QC == oracle, incl. the reference fixtures
distributed across multiple slices in one DataFrame (group isolation)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from olympian_spark.flags import Flag
from olympian_spark.operators.qc_spatial import buddy_check_spatial, sct_spatial
from olympian_spark.oracle import buddy_check as oracle_buddy
from olympian_spark.oracle import sct as oracle_sct

P, FA = int(Flag.PASS), int(Flag.FAIL)


def _collect_flags(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.slice_key, {})[r.station_idx] = r.flag
    return {k: [v[i] for i in sorted(v)] for k, v in out.items()}


def test_buddy_fixtures_in_one_dataframe(spark):
    """Both reference buddy fixtures as two slices of one DataFrame."""
    rows = []
    # doc-test slice (lib.rs:7-30)
    lons3 = [60.0, 60.00011111, 60.00022222]
    vals3 = [0.0, 0.0, 1.0]
    for i in range(3):
        rows.append(("doc", i, 60.0, lons3[i], 0.0, vals3[i], True))
    # unit-test slice (buddy_check.rs:160-205)
    lons10 = [60.0 + i * 0.00011111 for i in range(9)] + [60.001]
    vals10 = [0.0] * 8 + [0.1, 1.0]
    for i in range(10):
        rows.append(("unit", i, 60.0, lons10[i], 0.0, vals10[i], True))
    df = spark.createDataFrame(
        rows,
        "slice_key string, station_idx int, lat float, lon float, elev float,"
        " value float, obs_to_check boolean",
    )
    out = _collect_flags(
        buddy_check_spatial(
            df,
            threshold=1.0,
            max_elev_diff=200.0,
            elev_gradient=-0.0065,
            min_std=0.01,
            num_iterations=2,
            radius=10000.0,
            num_min=1,
        )
    )
    assert out["doc"] == [P, P, FA]
    assert out["unit"] == [P] * 8 + [FA, FA]


def test_sct_fixture_and_random_slices_match_oracle(spark):
    rng = np.random.default_rng(5)
    rows = []
    slices = {}
    # reference sct.rs:477-502 fixture
    slices["ref"] = dict(
        lats=[60.0] * 3, lons=[10.0, 10.01, 10.02], elevs=[0.0] * 3, values=[0.0, 1.0, 100.0]
    )
    # random slices: clustered stations with occasional outliers + NaN elev
    for s in range(4):
        n = int(rng.integers(8, 40))
        lats = 60.0 + rng.normal(0, 0.01, n)
        lons = 10.0 + rng.normal(0, 0.01, n)
        elevs = np.abs(rng.normal(100, 50, n))
        values = rng.normal(10, 1, n)
        out_i = rng.choice(n, size=max(1, n // 10), replace=False)
        values[out_i] += rng.choice([-30, 30], size=out_i.size)
        if s == 2:
            elevs[0] = np.nan  # must yield Flag.INVALID
        slices[f"r{s}"] = dict(
            lats=lats.tolist(), lons=lons.tolist(), elevs=elevs.tolist(), values=values.tolist()
        )
    for key, sl in slices.items():
        for i in range(len(sl["lats"])):
            rows.append(
                (key, i, float(sl["lats"][i]), float(sl["lons"][i]),
                 float(sl["elevs"][i]), float(sl["values"][i]), True)
            )
    df = spark.createDataFrame(
        rows,
        "slice_key string, station_idx int, lat float, lon float, elev float,"
        " value float, obs_to_check boolean",
    ).repartition(4)

    params = dict(
        num_min=3, num_max=10, inner_radius=10000.0, outer_radius=10000.0,
        num_iterations=1, num_min_prof=0, min_elev_diff=100.0,
        min_horizontal_scale=10000.0, vertical_scale=200.0,
    )
    out = _collect_flags(sct_spatial(df, pos=2.0, neg=2.0, eps2=0.5, **params))
    assert out["ref"] == [P, P, FA]
    for key, sl in slices.items():
        n = len(sl["lats"])
        expected = oracle_sct(
            sl["lats"], sl["lons"], sl["elevs"], sl["values"],
            pos=[2.0] * n, neg=[2.0] * n, eps2=[0.5] * n, obs_to_check=None, **params
        )
        assert out[key] == expected, f"sct mismatch in slice {key}"


def test_buddy_random_slices_per_station_params(spark):
    """Per-station radius/num_min vectors + NaN values (pre-Fail) + masking."""
    rng = np.random.default_rng(9)
    rows, slices = [], {}
    for s in range(3):
        n = int(rng.integers(6, 30))
        sl = dict(
            lats=(60 + rng.normal(0, 0.005, n)).tolist(),
            lons=(10 + rng.normal(0, 0.005, n)).tolist(),
            elevs=np.abs(rng.normal(50, 20, n)).tolist(),
            values=rng.normal(5, 1, n).tolist(),
            radius=rng.choice([5000.0, 10000.0], n).tolist(),
            num_min=rng.choice([1, 2], n).tolist(),
            obs=rng.random(n) > 0.2,
        )
        sl["values"][0] = float("nan")
        slices[f"b{s}"] = sl
        for i in range(n):
            rows.append(
                (f"b{s}", i, sl["lats"][i], sl["lons"][i], sl["elevs"][i],
                 sl["values"][i], bool(sl["obs"][i]), sl["radius"][i], int(sl["num_min"][i]))
            )
    df = spark.createDataFrame(
        rows,
        "slice_key string, station_idx int, lat float, lon float, elev float,"
        " value float, obs_to_check boolean, radius float, num_min int",
    )
    out = _collect_flags(
        buddy_check_spatial(
            df, threshold=2.0, max_elev_diff=200.0, elev_gradient=-0.0065,
            min_std=0.01, num_iterations=3, radius="radius", num_min="num_min",
            use_obs_to_check=True,
        )
    )
    for key, sl in slices.items():
        expected = oracle_buddy(
            sl["lats"], sl["lons"], sl["elevs"], sl["values"],
            radii=sl["radius"], nums_min=sl["num_min"], threshold=2.0,
            max_elev_diff=200.0, elev_gradient=-0.0065, min_std=0.01,
            num_iterations=3, obs_to_check=sl["obs"],
        )
        assert out[key] == expected, f"buddy mismatch in slice {key}"
        assert out[key][0] == FA  # NaN pre-fail


def test_sct_driver_side_validation(spark):
    df = spark.createDataFrame(
        [("s", 0, 60.0, 10.0, 0.0, 1.0, True)],
        "slice_key string, station_idx int, lat float, lon float, elev float,"
        " value float, obs_to_check boolean",
    )
    with pytest.raises(ValueError):
        sct_spatial(df, num_min=1, num_max=10, inner_radius=1.0, outer_radius=1.0,
                    num_iterations=1, num_min_prof=0, min_elev_diff=1.0,
                    min_horizontal_scale=1.0, vertical_scale=1.0,
                    pos=2.0, neg=2.0, eps2=0.5)
    with pytest.raises(ValueError):
        sct_spatial(df, num_min=2, num_max=10, inner_radius=1.0, outer_radius=1.0,
                    num_iterations=1, num_min_prof=0, min_elev_diff=1.0,
                    min_horizontal_scale=1.0, vertical_scale=1.0,
                    pos=2.0, neg=2.0, eps2=-0.5)
