"""Trusted NumPy float32 oracle.

A code-faithful re-implementation of the reference's QC routines
(intarga/olympian v0.3.2), including its quirks (see each function's
docstring). This is the correctness anchor: the Spark grouped kernels call
these exact functions per group, so the distributed output bit-matches the
oracle goldens by construction, and the reference's own test fixtures
(lib.rs:7-30, buddy_check.rs:160-205, sct.rs:477-531) prove the oracle
matches the reference.

Deterministic-arithmetic note: where the reference sums f32 in R*-tree
iteration order (unspecified), the oracle sums in station-index order /
via numpy f32 reductions — a documented deterministic choice; all reference
fixtures still reproduce exactly because their comparisons are
threshold-robust.
"""

from olympian_spark.oracle.quantile import compute_quantile  # noqa: F401
from olympian_spark.oracle.series import dip_check, flatline_check, step_check  # noqa: F401
from olympian_spark.oracle.spatial import buddy_check, sct  # noqa: F401
