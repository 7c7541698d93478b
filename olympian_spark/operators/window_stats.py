"""Per-series rolling statistics: trailing z-score anomalies and EWMA.

Both are single-window operators: ONE shuffle on the series key, then
ordered evaluation inside each partition (Spark's WindowExec — sort
within partitions, no second exchange). No UDFs: everything is JVM
expression trees under whole-stage codegen, so the operators scale with
the engine's windowing, not with Python.

Numeric determinism contract (shared with the repo's oracle convention):
callers who need bit-exact cross-engine results should feed integer
values (e.g. a fixed-point quantization of a double measure). Sums of
integers are exact in any accumulation order; the float math on top is
then an identical IEEE expression tree in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    by: str | list[str] = "user_id",
    window_s: int = 3600,
    min_periods: int = 5,
    out_col: str = "zscore_x1e6",
) -> DataFrame:
    """Trailing-window z-score of ``value_col`` per series: how many
    sample standard deviations the current point sits from the mean of
    the preceding ``window_s`` seconds (window INCLUDES the current row —
    the streaming-friendly convention that needs no future data).

    The anomaly-detection primitive of every metrics pipeline. NULL where
    the window holds fewer than ``min_periods`` points or has zero
    variance. Output is floor(z * 1e6) as a long (exact cross-engine
    comparison); variance comes from (sum, sum-of-squares, count) — all
    exact for integer inputs — rather than a builtin ``stddev`` whose
    accumulation algorithm differs between engines.

    Plan: one RANGE window over unix-microsecond order — a single
    exchange on ``by``; at 100 TB this is the same shape as the engine's
    QC stage (and composes with it: same partitioning, no extra shuffle
    when chained).
    """
    keys = [by] if isinstance(by, str) else list(by)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(us)
        .rangeBetween(-window_s * 1_000_000, 0)
    )
    v = F.col(value_col).cast("double")
    n = F.count(value_col).over(w).cast("double")
    s = F.sum(v).over(w)
    ssq = F.sum(v * v).over(w)
    var = (ssq - s * s / n) / (n - 1)
    z = (v - s / n) / F.sqrt(var)
    return df.withColumn(
        out_col,
        F.when(
            (n >= min_periods) & (var > 0), F.floor(z * 1e6).cast("long")
        ),
    )


def ewma(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    by: str | list[str] = "user_id",
    alpha: float = 0.3,
    window: int = 16,
    out_col: str = "ewma_x1e6",
    tiebreak: str | None = None,
) -> DataFrame:
    """Exponentially-weighted moving average over the last ``window``
    points of each series (adjust=True normalization: weights are
    renormalized over the points actually present, so series heads are
    unbiased).

    The infinite-memory recursive EWMA is deliberately truncated at
    ``window`` terms: with alpha=0.3 the dropped tail weight is
    0.7^16 ≈ 0.3% — below any decision threshold — and the bounded form
    is (a) expressible as a fixed fan of ``lag`` terms inside ONE window
    (no sequential scan, no UDF, whole-stage codegen), and (b) exactly
    reproducible by any engine as the same closed-form weighted sum,
    which the unbounded recursion is not (it needs O(series-length)
    recursion or numerically exploding (1-a)^-t prefix tricks).

    Output: floor(ewma * 1e6) as long. One shuffle on ``by``.
    """
    keys = [by] if isinstance(by, str) else list(by)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # lag() is row-positional: equal timestamps need a deterministic
    # tiebreaker for cross-engine (and cross-run) reproducibility
    order = [us] if tiebreak is None else [us, F.col(tiebreak)]
    w = Window.partitionBy(*keys).orderBy(*order)
    num: Column = F.lit(0.0)
    den: Column = F.lit(0.0)
    for k in range(window):
        x = F.lag(F.col(value_col).cast("double"), k).over(w)
        wt = float((1.0 - alpha) ** k)
        num = num + F.coalesce(x * wt, F.lit(0.0))
        den = den + F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return df.withColumn(out_col, F.floor(num / den * 1e6).cast("long"))
