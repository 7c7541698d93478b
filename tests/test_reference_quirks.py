"""Targeted tests for the reference's load-bearing quirks (SURVEY §2) beyond
the shipped fixtures — each pins a behaviour that a 'clean' reimplementation
would get wrong."""

import numpy as np

from olympian_spark.flags import Flag
from olympian_spark.oracle import buddy_check, sct
from olympian_spark.oracle.spatial import convert_coordinates

P, FA, IV, IS = int(Flag.PASS), int(Flag.FAIL), int(Flag.INVALID), int(Flag.ISOLATED)


def test_colocated_stations_exclude_each_other():
    """spatial_tree.rs:63-66: neighbour exclusion is by exact xyz equality,
    so two stations at the SAME coordinates are not each other's buddies.
    Station 2 (co-located with 3) must rely on the distant pair only."""
    # stations 0,1 close together; 2 and 3 exactly co-located nearby
    lats = [60.0, 60.0, 60.0005, 60.0005]
    lons = [60.0, 60.0001, 60.0, 60.0]
    flags = buddy_check(
        lats, lons, [0.0] * 4, [0.0, 0.0, 50.0, 50.0],
        radii=[10000.0], nums_min=[2], threshold=2.0, max_elev_diff=-1.0,
        elev_gradient=0.0, min_std=0.01, num_iterations=1,
    )
    # stations 0,1 see buddies incl. the 50s (spread ~27) -> |x-mean|/std
    # ~1.2 <= 2 -> Pass. Stations 2,3 exclude their exact-xyz twin, so their
    # buddy list is only {0,1} = [0,0] (std -> min_std) -> gross Fail. Were
    # the twin NOT excluded, 2's buddies would include value 50 and the
    # deviation would shrink below threshold.
    assert flags[0] == P and flags[1] == P
    assert flags[2] == FA and flags[3] == FA


def test_buddy_in_sweep_mutation_order_matters():
    """buddy_check.rs:98-100: a station failed EARLIER in the same sweep is
    excluded from later stations' buddy lists."""
    # 0 is a gross outlier; 1 is mildly off; 2,3 are the quiet majority.
    lats = [60.0, 60.0, 60.0, 60.0]
    lons = [60.0, 60.0001, 60.0002, 60.0003]
    vals = [100.0, 1.5, 0.0, 0.0]
    flags = buddy_check(
        lats, lons, [0.0] * 4, vals,
        radii=[10000.0], nums_min=[1], threshold=2.0, max_elev_diff=-1.0,
        elev_gradient=0.0, min_std=1.0, num_iterations=1,
    )
    # station 0 fails against mean(1.5,0,0); by the time 1 is checked, 0 is
    # already excluded, so 1 is judged against (0,0) only
    assert flags[0] == FA
    assert flags[1] == P  # |1.5-0|/max(std,1.0) = 1.5 <= 2.0 -> Pass


def test_sct_invalid_elev_and_isolated():
    """sct.rs:298-302 (non-finite elev -> Invalid) and sct.rs:346-350
    (< num_min neighbours in outer radius -> Isolated)."""
    lats = [60.0, 60.0, 60.0, 10.0]  # station 3 is far away -> isolated
    lons = [10.0, 10.001, 10.002, 10.0]
    elevs = [0.0, float("nan"), 0.0, 0.0]
    vals = [0.0, 0.0, 0.0, 0.0]
    flags = sct(
        lats, lons, elevs, vals,
        num_min=2, num_max=10, inner_radius=10000.0, outer_radius=10000.0,
        num_iterations=1, num_min_prof=0, min_elev_diff=100.0,
        min_horizontal_scale=10000.0, vertical_scale=200.0,
        pos=[2.0] * 4, neg=[2.0] * 4, eps2=[0.5] * 4,
    )
    assert flags[1] == IV
    assert flags[3] == IS


def test_sct_obs_to_check_marks_center_quirk():
    """sct.rs:444-448: a masked box MEMBER marks the CENTER as checked (not
    the member). Consequence: the masked member is never flagged, and the
    sweep still converges."""
    lats = [60.0] * 3
    lons = [10.0, 10.01, 10.02]
    vals = [0.0, 1.0, 100.0]
    flags = sct(
        lats, lons, [0.0] * 3, vals,
        num_min=2, num_max=10, inner_radius=10000.0, outer_radius=10000.0,
        num_iterations=2, num_min_prof=0, min_elev_diff=100.0,
        min_horizontal_scale=10000.0, vertical_scale=200.0,
        pos=[2.0] * 3, neg=[2.0] * 3, eps2=[0.5] * 3,
        obs_to_check=[True, True, False],  # the outlier is masked
    )
    assert flags[2] == P  # masked: used as background, never flagged


def test_buddy_num_removed_bookkeeping_quirk():
    """buddy_check.rs:140-149: num_removed_last_iteration stores the DELTA.
    With pre-failed (NaN) stations the first sweep's count includes them,
    and convergence still terminates (no infinite loop) — pinned by running
    many iterations."""
    lats = [60.0] * 5
    lons = [60.0 + i * 1e-4 for i in range(5)]
    vals = [float("nan"), 0.0, 0.0, 0.0, 10.0]
    flags = buddy_check(
        lats, lons, [0.0] * 5, vals,
        radii=[10000.0], nums_min=[1], threshold=1.0, max_elev_diff=-1.0,
        elev_gradient=0.0, min_std=0.5, num_iterations=50,
    )
    assert flags[0] == FA  # NaN pre-fail
    assert flags[4] == FA  # outlier
    assert flags[1:4] == [P, P, P]


def test_xyz_f32_roundtrip_matches_reference_scale():
    """convert_coordinates embeds on the 6371-km sphere in f32
    (util/mod.rs:94,101-107): spot-check the doc-test geometry — 1e-4 deg of
    longitude at lat 60 is ~11 m chord, so the doc-test's 10000 km^2 squared
    radius (100 km) covers all three stations."""
    x, y, z = convert_coordinates(np.array([60.0, 60.0]), np.array([60.0, 60.00011111]))
    chord = np.sqrt((x[0] - x[1]) ** 2 + (y[0] - y[1]) ** 2 + (z[0] - z[1]) ** 2)
    assert 0.003 < float(chord) < 0.02  # ~5.6 m in km
