"""Spine gap-fill + LOCF.

The relational materialization of the reference's ``SeriesCache``
(util/mod.rs:41-60): a dense regular time spine per series where a missing
observation is an explicit NULL slot — gaps become rows, exactly like the
reference's ``Vec<Option<f32>>``.

All pure DataFrame ops (sequence + posexplode + left join), fully
Catalyst-optimizable; one shuffle on series_id which is shared with every
downstream per-series window. Calendar-aware periods ("1 month") map to
``sequence(..., interval 1 month)`` — Spark's sequence is calendar-correct,
matching chronoutil's RelativeDuration semantics (util/mod.rs:44-45).

Scale guard: slots-per-series is bounded (default 10M) — a pathological
(min_ts, max_ts, period) combination fails fast at the driver instead of
exploding a task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_GRAIN_INTERVAL = {
    "minute": "interval 1 minute",
    "hour": "interval 1 hour",
    "day": "interval 1 day",
    "month": "interval 1 month",
    "week": "interval 1 week",
}


def gap_fill(
    df: DataFrame,
    period_s: int | None = None,
    grain: str | None = None,
    series_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
    max_slots_per_series: int = 10_000_000,
) -> DataFrame:
    """Materialize the dense spine for each series.

    Exactly one of ``period_s`` (fixed period anchored at the series' first
    observation — the SeriesCache model) or ``grain`` (calendar buckets via
    date_trunc: 'minute'|'hour'|'day'|'week'|'month').

    When several observations land in one slot the slot takes the *last*
    one (max by (ts, tiebreak)) — deterministic under the stable turn
    ordering invariant.

    Returns (series_col, spine_idx, spine_ts, value) with NULL value = gap.
    """
    if (period_s is None) == (grain is None):
        raise ValueError("exactly one of period_s / grain")

    # normalize TIMESTAMP_NTZ inputs (parquet naive) to TimestampType; the
    # session tz is UTC so instants are unchanged
    if not isinstance(df.schema[ts_col].dataType, __import__("pyspark").sql.types.TimestampType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))

    tb = tiebreak_col or ts_col

    if grain is not None:
        if grain not in _GRAIN_INTERVAL:
            raise ValueError(f"unsupported grain {grain!r}")
        interval = _GRAIN_INTERVAL[grain]
        slot = F.date_trunc(grain, F.col(ts_col))
        obs = (
            df.withColumn("_slot", slot)
            .groupBy(series_col, "_slot")
            .agg(
                F.max_by(
                    F.col(value_col), F.struct(F.col(ts_col), F.col(tb))
                ).alias("value")
            )
        )
        bounds = obs.groupBy(series_col).agg(
            F.min("_slot").alias("_t0"), F.max("_slot").alias("_t1")
        )
        spine = bounds.select(
            series_col,
            F.posexplode(F.expr(f"sequence(_t0, _t1, {interval})")).alias(
                "spine_idx", "spine_ts"
            ),
        ).withColumn("spine_idx", F.col("spine_idx").cast("long"))
        joined = spine.join(
            obs.withColumnRenamed("_slot", "spine_ts"), [series_col, "spine_ts"], "left"
        )
        return joined.select(series_col, "spine_idx", "spine_ts", "value")

    # fixed-period mode, anchored at per-series min ts; exact µs integer math
    p_us = int(period_s) * 1_000_000
    bounds = df.groupBy(series_col).agg(
        F.min(F.unix_micros(F.col(ts_col))).alias("_t0us"),
        F.max(F.unix_micros(F.col(ts_col))).alias("_t1us"),
    )
    bounds = bounds.withColumn("_nslots", ((F.col("_t1us") - F.col("_t0us")) / p_us).cast("long") + 1)
    # scale guard folded into the plan: assert_true evaluates per bounds-row
    # during the spine job itself (zero extra Spark jobs; the old driver-side
    # .count() guard ran a full groupBy of the input before the real work).
    # assert_true yields NULL when the predicate holds, so adding its
    # coalesced cast keeps _nslots unchanged on the happy path.
    # INVARIANT: the guard lives ONLY because _nslots (which carries it) is
    # consumed by the spine sequence() below. Any refactor that stops reading
    # _nslots lets Catalyst column-prune the assert_true away and silently
    # drops max_slots_per_series protection — tests/test_spine.py pins this
    # with an over-limit series that must raise.
    guard = F.assert_true(
        F.col("_nslots") <= max_slots_per_series,
        F.lit(f"gap_fill: a series exceeds {max_slots_per_series} slots"),
    )
    bounds = bounds.withColumn(
        "_nslots", F.col("_nslots") + F.coalesce(guard.cast("long"), F.lit(0))
    )

    spine = bounds.select(
        series_col,
        F.col("_t0us"),
        F.posexplode(F.expr("sequence(CAST(0 AS LONG), _nslots - 1)")).alias(
            "spine_idx", "_k"
        ),
    ).select(
        series_col,
        F.col("spine_idx").cast("long").alias("spine_idx"),
        F.timestamp_micros(F.col("_t0us") + F.col("_k") * F.lit(p_us)).alias("spine_ts"),
    )

    obs = (
        df.join(bounds.select(series_col, "_t0us"), series_col)
        .withColumn(
            "spine_idx",
            ((F.unix_micros(F.col(ts_col)) - F.col("_t0us")) / p_us).cast("long"),
        )
        .groupBy(series_col, "spine_idx")
        .agg(F.max_by(F.col(value_col), F.struct(F.col(ts_col), F.col(tb))).alias("value"))
    )
    return spine.join(obs, [series_col, "spine_idx"], "left").select(
        series_col, "spine_idx", "spine_ts", "value"
    )


def locf(
    df: DataFrame,
    value_col: str = "value",
    series_col: str = "conv_id",
    order_col: str = "spine_idx",
    out_col: str | None = None,
) -> DataFrame:
    """Last-observation-carried-forward over the spine.

    ``last(value, ignorenulls=True)`` over an unbounded-preceding row frame —
    JVM-side, single pass, reuses the series_id partitioning (no extra
    shuffle after gap_fill). Leading gaps (nothing to carry) stay NULL.
    """
    w = (
        Window.partitionBy(series_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        out_col or f"{value_col}_locf", F.last(value_col, ignorenulls=True).over(w)
    )
