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
