"""Tier A: the reference's own executable fixtures, verbatim.

These four vectors are the ground truth linking our NumPy oracle to
intarga/olympian v0.3.2 (lib.rs:7-30, buddy_check.rs:160-205,
sct.rs:477-531). The Spark kernels call the same oracle functions, so
passing here + kernel-equality tests = reference parity.
"""

import numpy as np

from olympian_spark.flags import Flag
from olympian_spark.oracle import buddy_check, compute_quantile, sct

P, F, W, I = int(Flag.PASS), int(Flag.FAIL), int(Flag.WARN), int(Flag.ISOLATED)


def test_buddy_doc_test():
    # reference lib.rs:7-30
    flags = buddy_check(
        lats=[60.0, 60.0, 60.0],
        lons=[60.0, 60.00011111, 60.00022222],
        elevs=[0.0, 0.0, 0.0],
        values=[0.0, 0.0, 1.0],
        radii=[10000.0],
        nums_min=[1],
        threshold=1.0,
        max_elev_diff=200.0,
        elev_gradient=-0.0065,
        min_std=0.01,
        num_iterations=2,
        obs_to_check=None,
    )
    assert flags == [P, P, F]


def test_buddy_unit_test():
    # reference buddy_check.rs:160-205
    n = 10
    lons = [
        60.0,
        60.00011111,
        60.00022222,
        60.00033333,
        60.00044444,
        60.00055556,
        60.00066667,
        60.00077778,
        60.00088889,
        60.001,
    ]
    flags = buddy_check(
        lats=[60.0] * n,
        lons=lons,
        elevs=[0.0] * n,
        values=[0.0] * 8 + [0.1, 1.0],
        radii=[10000.0],
        nums_min=[1],
        threshold=1.0,
        max_elev_diff=200.0,
        elev_gradient=-0.0065,
        min_std=0.01,
        num_iterations=2,
        obs_to_check=None,
    )
    assert flags == [P] * 8 + [F, F]


def test_sct_simple():
    # reference sct.rs:477-502
    flags = sct(
        lats=[60.0] * 3,
        lons=[10.0, 10.01, 10.02],
        elevs=[0.0] * 3,
        values=[0.0, 1.0, 100.0],
        num_min=3,
        num_max=10,
        inner_radius=10000.0,
        outer_radius=10000.0,
        num_iterations=1,
        num_min_prof=0,
        min_elev_diff=100.0,
        min_horizontal_scale=10000.0,
        vertical_scale=200.0,
        pos=[2.0] * 3,
        neg=[2.0] * 3,
        eps2=[0.5] * 3,
        obs_to_check=None,
    )
    assert flags == [P, P, F]


def test_sct_10k_grid():
    # reference sct.rs:504-531: 10,000-station pseudo-grid, expect all Pass
    n = 10000
    i = np.arange(n, dtype=np.float32)
    lats = (i**2 * np.float32(0.001)) % np.float32(1.0)
    lons = ((i + np.float32(1.0)) ** 2 * np.float32(0.001)) % np.float32(1.0)
    flags = sct(
        lats=lats,
        lons=lons,
        elevs=[1.0] * n,
        values=[1.0] * n,
        num_min=5,
        num_max=100,
        inner_radius=50000.0,
        outer_radius=150000.0,
        num_iterations=5,
        num_min_prof=20,
        min_elev_diff=200.0,
        min_horizontal_scale=10000.0,
        vertical_scale=200.0,
        pos=[4.0] * n,
        neg=[8.0] * n,
        eps2=[0.5] * n,
        obs_to_check=[True] * n,
    )
    assert flags == [P] * n


def test_quantile_matches_numpy_linear():
    rng = np.random.default_rng(42)
    arr = rng.normal(size=101).astype(np.float32)
    for q in (0.05, 0.10, 0.5, 0.95):
        ours = compute_quantile(q, arr)
        ref = np.quantile(arr.astype(np.float64), q, method="linear")
        assert abs(float(ours) - float(ref)) < 1e-5
