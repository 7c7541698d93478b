"""Timeseries QC as pure window-function CASE expressions.

step_check / dip_check / flatline_check re-expressed relationally: the
reference's width-2/3 sliding windows (step_check.rs:24-26,
dip_check.rs:33-35) become ``lag``/``lead`` over a per-series ordered window
— JVM-side, whole-stage-codegen'd, zero Python in the hot path.

f32 parity: value columns stay FloatType and every literal is cast to float,
so Spark's float arithmetic reproduces the reference's f32 ops bit-for-bit
(float-float subtraction, abs, compare — all exact f32 in the JVM).

NaN parity: Spark orders NaN greater than everything and NaN==NaN true —
the opposite of Rust f32 comparison semantics where every NaN compare is
false. Explicit isnan() guards restore reference behaviour (a NaN window
yields PASS in step/dip; NaN never extends a flatline run).

Run these over the gap-filled spine (NULL = gap) so ``lag`` sees gaps exactly
as the reference's ``windows(2/3)`` sees ``None``; or directly over raw turn
series where every turn is an observation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from olympian_spark.flags import Flag

def PASS() -> Column:
    return F.lit(int(Flag.PASS))


def FAIL() -> Column:
    return F.lit(int(Flag.FAIL))


def WARN() -> Column:
    return F.lit(int(Flag.WARN))


def DATA_MISSING() -> Column:
    return F.lit(int(Flag.DATA_MISSING))


def _f32(x: float) -> Column:
    return F.lit(float(x)).cast("float")


def step_flag(
    value_col: str, series_col: str, order_col: str, high: float, max_: float
) -> Column:
    """Flag column for step_check (step_check.rs:16-44).

    The flag belongs to the window's successor (the current row); the first
    row of each series has no predecessor -> DATA_MISSING, which corresponds
    to the reference's leading-context trim: callers restrict to
    ``order_col >= num_leading_points`` to reproduce exact output alignment.

    REPLICATED BUG: Warn tested before Fail (step_check.rs:35-41) — with
    conventional high < max_ every exceedance is WARN and FAIL is
    unreachable. Matching the code, not the doc.
    """
    w = Window.partitionBy(series_col).orderBy(order_col)
    prev = F.lag(F.col(value_col)).over(w)
    cur = F.col(value_col)
    diff = F.abs(prev - cur)  # float - float stays float
    return (
        F.when(prev.isNull() | cur.isNull(), DATA_MISSING())
        .when(F.isnan(prev) | F.isnan(cur), PASS())  # Rust: NaN compares false
        .when(diff > _f32(high), WARN())
        .when(diff > _f32(max_), FAIL())
        .otherwise(PASS())
        .cast("tinyint")
    )


def dip_flag(
    value_col: str, series_col: str, order_col: str, high: float, max_: float
) -> Column:
    """Flag column for dip_check / spike test (dip_check.rs:21-62).

    Flag belongs to the middle point; first/last rows of a series have no
    neighbour -> DATA_MISSING (context trim as in step_flag).
    """
    w = Window.partitionBy(series_col).orderBy(order_col)
    d0 = F.lag(F.col(value_col)).over(w)
    d1 = F.col(value_col)
    d2 = F.lead(F.col(value_col)).over(w)
    a = F.abs(d2 - d1)
    b = F.abs(d1 - d0)
    diffsum = F.abs(a + b)
    diffdiff = F.abs(a - b)
    is_extremum = ((d2 < d1) & (d0 < d1)) | ((d2 > d1) & (d0 > d1))
    return (
        F.when(d0.isNull() | d1.isNull() | d2.isNull(), DATA_MISSING())
        .when(F.isnan(d0) | F.isnan(d1) | F.isnan(d2), PASS())
        .when(
            is_extremum & (diffdiff < diffsum * _f32(0.35)),
            F.when(diffsum > _f32(max_), FAIL())
            .when(diffsum > _f32(high), WARN())
            .otherwise(PASS()),
        )
        .otherwise(PASS())
        .cast("tinyint")
    )


def with_flatline_flag(
    df: DataFrame,
    value_col: str,
    series_col: str,
    order_col: str,
    min_run: int,
    out_col: str = "flag_flatline",
) -> DataFrame:
    """Engine-added flatline check: FAIL every point in a run of >= min_run
    consecutive equal non-gap values; gaps are DATA_MISSING and break runs.

    Two-phase relational plan: (1) run ids via a cumulative sum of
    change-indicators over the existing (series|order) window; (2) run
    length via a count window over (series, run_id). The series-level hash
    partitioning already satisfies the (series, run_id) clustered
    distribution, so phase 2 costs a sort, not a shuffle (verified with
    explain: the whole QC stage plans exactly two exchanges). NaN breaks
    runs (Rust NaN != NaN).
    """
    if min_run < 2:
        raise ValueError("min_run must be >= 2")
    w = Window.partitionBy(series_col).orderBy(order_col)
    v = F.col(value_col)
    prev = F.lag(v).over(w)
    nan_break = F.isnan(v) | (~F.isnull(prev) & F.isnan(prev))
    change = F.when(
        v.isNull() | prev.isNull() | nan_break | (v != prev), F.lit(1)
    ).otherwise(F.lit(0))
    run = df.withColumn("_run_id", F.sum(change).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    wr = Window.partitionBy(series_col, "_run_id")
    flag = (
        F.when(v.isNull(), DATA_MISSING())
        .when((F.count(F.lit(1)).over(wr) >= min_run) & ~F.isnan(v), FAIL())
        .otherwise(PASS())
        .cast("tinyint")
    )
    return run.withColumn(out_col, flag).drop("_run_id")
