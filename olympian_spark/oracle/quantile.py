"""Float32 linear-interpolated quantile.

Faithful to reference ``compute_quantile`` (src/qc_tests/sct.rs:70-103):
drop non-finite, sort ascending, linearly interpolate between
``floor(q*(n-1))`` and ``ceil(q*(n-1))`` — numpy's ``method='linear'``
but computed in float32. This single kernel is both the SCT helper and the
engine's exact-p95 definition for rollup tiers (never percentile_approx).
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


def compute_quantile_segmented(
    q: float, values: np.ndarray, starts: np.ndarray
) -> np.ndarray:
    """Per-segment quantile, bit-identical to :func:`compute_quantile` on
    each slice (same f32 expression tree, elementwise IEEE ops).

    ``values``: finite f32 values, segment-contiguous (the caller applies
    the finite/ok filtering); ``starts``: segment boundaries into it.
    Empty segments yield NaN (the tier kernels' NULL marker) instead of the
    scalar function's raise — callers there skip empty buckets anyway.
    """
    values = np.asarray(values, dtype=F32)
    nb = starts.size - 1
    counts = np.diff(starts).astype(np.int64)
    out = np.full(nb, np.nan, F32)
    nz = np.flatnonzero(counts > 0)
    if nz.size == 0:
        return out
    seg = np.repeat(np.arange(nb, dtype=np.int64), counts)
    order = np.lexsort((values, seg))
    sv = values[order]
    qf = F32(q)
    n1 = (counts[nz] - 1).astype(np.int64)
    n1f = n1.astype(F32)
    pos = qf * n1f
    lower = np.floor(pos).astype(np.int64)
    upper = np.ceil(pos).astype(np.int64)
    base = starts[:-1][nz]
    lv = sv[base + lower]
    uv = sv[base + upper]
    with np.errstate(divide="ignore", invalid="ignore"):
        lq = lower.astype(F32) / n1f
        uq = upper.astype(F32) / n1f
        f = (qf - lq) / (uq - lq)
        res = (lv + (uv - lv) * f).astype(F32, copy=False)
    same = lower == upper
    res[same] = lv[same]
    out[nz] = res
    return out


def compute_quantile(q: float, arr: np.ndarray) -> np.float32:
    a = np.asarray(arr, dtype=F32)
    a = a[np.isfinite(a)]
    n = a.size
    if n == 0:
        raise ValueError("quantile of empty array")  # reference asserts n > 0
    a = np.sort(a)  # total order fine: no NaN left
    qf = F32(q)
    pos = qf * F32(n - 1)
    lower = int(np.floor(pos))
    upper = int(np.ceil(pos))
    lower_value = a[lower]
    upper_value = a[upper]
    if lower == upper:
        return lower_value
    lower_q = F32(lower) / F32(n - 1)
    upper_q = F32(upper) / F32(n - 1)
    f = (qf - lower_q) / (upper_q - lower_q)
    return F32(lower_value + (upper_value - lower_value) * f)
