"""Interval (range) join: point events vs time windows, without a theta-join.

``events JOIN windows ON ts BETWEEN w_start AND w_end`` is the classic
Spark trap: Catalyst plans a non-equi condition as BroadcastNestedLoopJoin
(fine only while one side broadcasts) or a cartesian product — O(n·m)
either way, instant death at 100 TB of events. The scale-correct plan is
the standard **bucketed band join**: truncate both sides to a time grain,
explode each interval to the grain buckets it covers, equi-join on the
bucket (hash shuffle, AQE/broadcast eligible like any equi-join), then
apply the exact containment predicate. Each event carries exactly ONE
bucket, so a (event, interval) pair can match at most once — no dedup
pass needed.

Grain choice is the only tuning knob: explode factor per interval is
``duration/grain + 1``, so pick the grain near the median interval
length (docstring of :func:`interval_join`). Cost is
O(events + intervals·explode_factor), never O(events·intervals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_GRAIN_US = {
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    grain: str = "hour",
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner-join events to every interval containing their timestamp.

    Output: event columns + interval columns (names must not collide).
    Containment is ``start <= ts < end`` (half-open, the engine's
    convention everywhere) unless ``end_inclusive``.

    Plan shape: intervals explode via ``sequence()`` over bucket numbers
    (pure JVM), events map to one bucket each; the join is a plain
    equi-join on the bucket long — shuffle-hash/broadcast per AQE, with
    the exact predicate applied post-join. Pre-epoch timestamps are safe:
    the bucket is floor-division of unix microseconds (``floor(a/b)``,
    not the sign-of-dividend ``%``).
    """
    gus = _GRAIN_US[grain]
    ev_b = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / gus)
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    # half-open end lands exactly on a bucket edge -> that bucket holds no
    # member points; still harmless to emit it (exact filter drops them),
    # but skip it to keep the explode factor minimal
    last_b = F.floor((e_us - (0 if end_inclusive else 1)) / F.lit(gus))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(s_us / gus), F.greatest(last_b, F.floor(s_us / gus)))),
    )
    ev = events.withColumn("_bucket", ev_b)
    ts = F.col(ts_col).cast("timestamp")
    cond = (ts >= F.col(start_col).cast("timestamp")) & (
        ts <= F.col(end_col).cast("timestamp")
        if end_inclusive
        else ts < F.col(end_col).cast("timestamp")
    )
    return ev.join(iv, "_bucket").where(cond).drop("_bucket")


def coalesce_intervals(
    df: DataFrame,
    by: str | list[str] | None = "key",
    start_col: str = "w_start",
    end_col: str = "w_end",
) -> DataFrame:
    """Merge overlapping-or-touching intervals per key into maximal
    disjoint islands (the gaps-and-islands problem): retention windows,
    downtime merging, session span compaction.

    An interval starts a NEW island iff its start exceeds the running
    max end of every EARLIER interval (ordered by start, then end) —
    touching intervals (start == previous end) merge, per the engine's
    half-open convention where they cover a contiguous range. Island id
    is the running count of new-island flags; one groupBy collapses each
    island to (island_start, island_end, n_merged).

    Plan: one window (one exchange on the keys + in-partition sort) and
    one reuse-partitioned groupBy — islands never cross keys, so at
    100 TB this scales with the per-key interval count, and the running
    max makes it robust to intervals nested inside earlier long ones
    (the classic bug in `lag(end)`-based merges).
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    s, e = F.col(start_col), F.col(end_col)
    w = Window.partitionBy(*keys).orderBy(s, e)
    prev_max_end = F.max(e).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max_end.isNull() | (s > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("_island", island)
        .groupBy(*keys, "_island")
        .agg(
            F.min(s).alias("island_start"),
            F.max(e).alias("island_end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_island")
    )
