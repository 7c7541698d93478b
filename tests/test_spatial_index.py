"""Grid neighbour index == brute-force chord scan, bit-identical flags.

The uniform-grid index (oracle/spatial.py:_GridIndex) replaces the O(n)
per-station chord scan for slices >= _GRID_MIN_N — the engine-side analogue
of the reference's R*-tree (spatial_tree.rs:41). These tests force each
path via the _GRID_MIN_N knob and require IDENTICAL flags (the index
returns candidates in ascending station order with exact-f32 distances, so
every downstream f32 reduction sees the same elements in the same order),
plus a 10^5-station slice completing in bounded wall time.
"""

import time

import numpy as np
import pytest

import olympian_spark.oracle.spatial as osp
from olympian_spark.flags import Flag
from olympian_spark.oracle.spatial import _GridIndex, buddy_check, convert_coordinates, sct


def _random_slice(rng, n, spread_deg=0.5):
    lats = 60.0 + rng.normal(0.0, spread_deg, n)
    lons = 10.0 + rng.normal(0.0, spread_deg, n)
    elevs = np.abs(rng.normal(100.0, 50.0, n))
    values = rng.normal(10.0, 1.0, n)
    out_i = rng.choice(n, size=max(1, n // 20), replace=False)
    values[out_i] += rng.choice([-25.0, 25.0], size=out_i.size)
    return lats, lons, elevs, values


def _with_grid_min(monkeypatch, val):
    monkeypatch.setattr(osp, "_GRID_MIN_N", val)


@pytest.mark.parametrize("n", [1000, 4000, 10000])
def test_grid_index_brute_force_candidate_equivalence(n):
    """The index's radius query returns exactly the brute-force candidate
    set, in the same (ascending) order, with bit-equal f32 distances."""
    rng = np.random.default_rng(100 + n)
    lats, lons, _, _ = _random_slice(rng, n)
    x, y, z = convert_coordinates(lats, lons)
    r2 = np.float32(25.0)  # squared chord km² (the reference's unit quirk)
    idx = _GridIndex(x, y, z, float(np.sqrt(np.float64(r2))))
    assert idx.ok
    for i in rng.choice(n, size=50, replace=False):
        cand, c2c = idx.neighborhood(int(i))
        got = cand[c2c <= r2]
        c2 = osp._chord2(x, y, z, int(i))
        want = np.where(c2 <= r2)[0]
        assert np.array_equal(got, want), f"candidate set differs at {i}"
        assert np.array_equal(
            c2c[c2c <= r2].view(np.uint32), c2[want].view(np.uint32)
        ), f"f32 distances differ at {i}"


@pytest.mark.parametrize("n", [1000, 3000, 10000])
def test_buddy_grid_equals_brute(n, monkeypatch):
    rng = np.random.default_rng(n)
    lats, lons, elevs, values = _random_slice(rng, n)
    values[0] = np.nan
    kw = dict(
        radii=[25.0], nums_min=[3], threshold=2.0, max_elev_diff=200.0,
        elev_gradient=-0.0065, min_std=0.01, num_iterations=2,
    )
    _with_grid_min(monkeypatch, 10**9)
    brute = buddy_check(lats, lons, elevs, values, **kw)
    _with_grid_min(monkeypatch, 0)
    grid = buddy_check(lats, lons, elevs, values, **kw)
    assert grid == brute
    assert any(f == int(Flag.FAIL) for f in grid)  # fixture not vacuous


@pytest.mark.parametrize("n", [1000, 3000])
def test_sct_grid_equals_brute(n, monkeypatch):
    rng = np.random.default_rng(7 * n)
    lats, lons, elevs, values = _random_slice(rng, n, spread_deg=0.3)
    elevs[1] = np.nan  # INVALID path stays identical too
    kw = dict(
        num_min=3, num_max=20, inner_radius=50.0, outer_radius=50.0,
        num_iterations=2, num_min_prof=10, min_elev_diff=100.0,
        min_horizontal_scale=10000.0, vertical_scale=200.0,
        pos=[2.0] * n, neg=[2.0] * n, eps2=[0.5] * n,
    )
    _with_grid_min(monkeypatch, 10**9)
    brute = sct(lats, lons, elevs, values, **kw)
    _with_grid_min(monkeypatch, 0)
    grid = sct(lats, lons, elevs, values, **kw)
    assert grid == brute
    assert any(f == int(Flag.FAIL) for f in grid)


def test_buddy_100k_stations_bounded_time():
    """A 10^5-station slice — brute force would be 10^10 chord ops per
    sweep; the grid keeps one full buddy sweep tractable in-process."""
    n = 100_000
    rng = np.random.default_rng(1234)
    lats, lons, elevs, values = _random_slice(rng, n, spread_deg=2.0)
    t0 = time.time()
    flags = buddy_check(
        lats, lons, elevs, values, radii=[4.0], nums_min=[3], threshold=2.0,
        max_elev_diff=200.0, elev_gradient=-0.0065, min_std=0.01,
        num_iterations=1,
    )
    wall = time.time() - t0
    assert len(flags) == n
    assert any(f == int(Flag.FAIL) for f in flags)
    assert wall < 120.0, f"100k-station buddy sweep took {wall:.1f}s"


def test_grid_handles_colocated_and_tiny_extent():
    """Degenerate geometry: all stations in one cell — grid returns the
    full set, matching brute force."""
    n = 50
    lats = np.full(n, 60.0)
    lons = np.full(n, 10.0)
    x, y, z = convert_coordinates(lats, lons)
    idx = _GridIndex(x, y, z, 5.0)
    assert idx.ok
    cand, c2c = idx.neighborhood(0)
    assert np.array_equal(cand, np.arange(n))
    assert np.all(c2c == np.float32(0.0))


def test_sct_20k_stations_bounded_time():
    """SCT at 20k stations (2x the reference's own 10k ceiling): the grid
    index bounds the neighbour search and checked-propagation bounds the
    number of solved boxes; one sweep completes in bounded wall time."""
    n = 20_000
    rng = np.random.default_rng(99)
    lats, lons, elevs, values = _random_slice(rng, n, spread_deg=1.0)
    t0 = time.time()
    flags = sct(
        lats, lons, elevs, values,
        num_min=3, num_max=30, inner_radius=50.0, outer_radius=50.0,
        num_iterations=1, num_min_prof=10, min_elev_diff=100.0,
        min_horizontal_scale=10000.0, vertical_scale=200.0,
        pos=[2.0] * n, neg=[2.0] * n, eps2=[0.5] * n,
    )
    wall = time.time() - t0
    assert len(flags) == n
    assert wall < 120.0, f"20k-station SCT sweep took {wall:.1f}s"
