"""Oracle semantics tests for step/dip/flatline (the reference ships no
step/dip fixtures — dip_check.rs:64 is literally `// TODO: test cases?` —
so these pin the code-faithful semantics incl. the Warn-before-Fail bug)."""

import pytest

from olympian_spark.flags import Flag
from olympian_spark.oracle import dip_check, flatline_check, step_check

P, F, W, D = (int(Flag.PASS), int(Flag.FAIL), int(Flag.WARN), int(Flag.DATA_MISSING))


def test_step_basic_and_bug():
    # high=1, max=5 (conventional order): jump of 10 must be WARN, not FAIL,
    # because step_check tests Warn before Fail (step_check.rs:35-41)
    vals = [0.0, 0.0, 10.0, 10.5]
    assert step_check(vals, num_leading_points=1, high=1.0, max_=5.0) == [P, W, P]
    # inverted thresholds make Fail reachable: diff in (max, high] -> Fail
    assert step_check(vals, num_leading_points=1, high=100.0, max_=5.0) == [P, F, P]


def test_step_gaps_and_trim():
    vals = [1.0, None, 3.0, 3.2]
    # num_leading=1: windows (1,None),(None,3),(3,3.2)
    assert step_check(vals, 1, 10.0, 20.0) == [D, D, P]
    # num_leading=2: trim 1 leading -> windows (None,3),(3,3.2)
    assert step_check(vals, 2, 10.0, 20.0) == [D, P]
    with pytest.raises(ValueError):
        step_check(vals, 0, 1.0, 2.0)
    with pytest.raises(ValueError):
        step_check([1.0], 1, 1.0, 2.0)


def test_dip_spike():
    # spike at index 2: symmetric up-down, diffsum=20 > max=10 -> Fail
    vals = [0.0, 0.0, 10.0, 0.0, 0.0]
    assert dip_check(vals, 1, 1, high=5.0, max_=10.0) == [P, F, P]
    # diffsum=20 in (high, max] -> Warn
    assert dip_check(vals, 1, 1, high=5.0, max_=100.0) == [P, W, P]
    # asymmetric spike (diffdiff >= 0.35*diffsum) -> Pass
    vals2 = [0.0, 0.0, 10.0, 8.0, 8.0]
    assert dip_check(vals2, 1, 1, high=5.0, max_=10.0) == [P, P, P]
    # monotone staircase: not a local extremum -> Pass
    vals3 = [0.0, 5.0, 10.0, 15.0, 20.0]
    assert dip_check(vals3, 1, 1, high=1.0, max_=2.0) == [P, P, P]


def test_dip_gaps_and_trims():
    vals = [1.0, 2.0, None, 2.0, 1.0]
    assert dip_check(vals, 1, 1, 1.0, 2.0) == [D, D, D]
    # trims: num_leading=2, num_trailing=2 -> windows over vals[1:4] -> 1 flag
    assert dip_check(vals, 2, 2, 1.0, 2.0) == [D]
    with pytest.raises(ValueError):
        dip_check(vals, 0, 1, 1.0, 2.0)
    with pytest.raises(ValueError):
        dip_check([1.0, 2.0], 1, 1, 1.0, 2.0)


def test_flatline():
    vals = [1.0, 1.0, 1.0, 2.0, None, 3.0, 3.0]
    assert flatline_check(vals, min_run=3) == [F, F, F, P, D, P, P]
    assert flatline_check(vals, min_run=2) == [F, F, F, P, D, F, F]
