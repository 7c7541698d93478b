"""Timeseries QC oracle: step_check / dip_check / flatline_check.

Float32 NumPy ports of reference src/qc_tests/step_check.rs:16-44 and
src/qc_tests/dip_check.rs:21-62, operating on a dense regular series
(``None``/NaN = gap) exactly like the reference's ``SeriesCache``.

flatline_check is engine-added (mandated by the north star's
"step/spike/flatline checks"); it follows the same Flag conventions.
"""

from __future__ import annotations

import numpy as np

from olympian_spark.flags import Flag

F32 = np.float32


def _as_optional_f32(values) -> list:
    """Normalize to a list of Optional[np.float32].

    Only ``None`` is a gap — the reference's ``Option<f32>`` can hold
    ``Some(NaN)``, and NaN flows through the comparisons (NaN > x is false,
    so a NaN window yields PASS, not DATA_MISSING). Replicated as-is.
    """
    return [None if v is None else F32(v) for v in values]


def step_check(values, num_leading_points: int, high: float, max_: float) -> list[int]:
    """Flag each point vs its immediate predecessor.

    Reference semantics (step_check.rs:16-44), all load-bearing:
    - error if num_leading_points == 0 or leading_trim + 2 > len
    - width-2 windows over values[num_leading_points-1:]; flag k belongs to
      the window's *successor*; output length = len - num_leading_points.
      No trailing trim: trailing context points are flagged too.
    - any gap in window -> DATA_MISSING
    - REPLICATED BUG (step_check.rs:35-41): Warn is tested BEFORE Fail, so
      with conventional high < max_, FAIL is unreachable (every exceedance is
      WARN). We match the code, not the doc (CHANGELOG confirms the fix was
      applied only to dip_check).
    """
    if num_leading_points < 1:
        raise ValueError("num_leading_points must be >= 1")
    vals = _as_optional_f32(values)
    leading_trim = num_leading_points - 1
    if leading_trim + 2 > len(vals):
        raise ValueError("series too short for step_check")
    trimmed = vals[leading_trim:]
    high = F32(high)
    max_ = F32(max_)
    flags = []
    for prev, cur in zip(trimmed, trimmed[1:]):
        if prev is None or cur is None:
            flags.append(int(Flag.DATA_MISSING))
            continue
        diff = F32(abs(F32(prev - cur)))
        if diff > high:
            flags.append(int(Flag.WARN))
        elif diff > max_:
            flags.append(int(Flag.FAIL))
        else:
            flags.append(int(Flag.PASS))
    return flags


def dip_check(
    values, num_leading_points: int, num_trailing_points: int, high: float, max_: float
) -> list[int]:
    """Flag each point vs its immediate predecessor and successor (spike test).

    Reference semantics (dip_check.rs:21-62):
    - error if either context count == 0 or trims + 3 > len
    - width-3 windows over values[lead-1 : len-(trail-1)]; flag belongs to the
      middle point; output length = len - num_leading - num_trailing.
    - any gap -> DATA_MISSING; else if middle is a strict local extremum:
      diffsum = ||d2-d1| + |d1-d0||, diffdiff = ||d2-d1| - |d1-d0||;
      if diffdiff < 0.35*diffsum: FAIL if diffsum > max_, elif > high WARN.
      (Fail-before-Warn here — the bug was fixed in dip_check only.)
    """
    if num_leading_points < 1 or num_trailing_points < 1:
        raise ValueError("num_leading/trailing_points must be >= 1")
    vals = _as_optional_f32(values)
    leading_trim = num_leading_points - 1
    trailing_trim = num_trailing_points - 1
    if leading_trim + trailing_trim + 3 > len(vals):
        raise ValueError("series too short for dip_check")
    trimmed = vals[leading_trim : len(vals) - trailing_trim]
    high = F32(high)
    max_ = F32(max_)
    p35 = F32(0.35)
    flags = []
    for d0, d1, d2 in zip(trimmed, trimmed[1:], trimmed[2:]):
        if d0 is None or d1 is None or d2 is None:
            flags.append(int(Flag.DATA_MISSING))
            continue
        if (d2 < d1 and d0 < d1) or (d2 > d1 and d0 > d1):
            a = F32(abs(F32(d2 - d1)))
            b = F32(abs(F32(d1 - d0)))
            diffsum = F32(abs(F32(a + b)))
            diffdiff = F32(abs(F32(a - b)))
            if diffdiff < F32(diffsum * p35):
                if diffsum > max_:
                    flags.append(int(Flag.FAIL))
                    continue
                if diffsum > high:
                    flags.append(int(Flag.WARN))
                    continue
        flags.append(int(Flag.PASS))
    return flags


def flatline_check(values, min_run: int) -> list[int]:
    """Engine-added flatline test (north-star "step/spike/flatline").

    A point FAILs if it is part of a run of >= min_run consecutive *equal,
    non-gap* values (bitwise f32 equality). Gaps flag DATA_MISSING. Output is
    full-length (no context trim: a run is self-contained).
    """
    if min_run < 2:
        raise ValueError("min_run must be >= 2")
    vals = _as_optional_f32(values)
    n = len(vals)
    flags = [int(Flag.PASS)] * n
    i = 0
    while i < n:
        if vals[i] is None:
            flags[i] = int(Flag.DATA_MISSING)
            i += 1
            continue
        j = i + 1
        while j < n and vals[j] is not None and vals[j] == vals[i]:
            j += 1
        if j - i >= min_run:
            for k in range(i, j):
                flags[k] = int(Flag.FAIL)
        i = j
    return flags
