"""Time-series downsampling for visualization / compact tiers.

M4 (Jugel, Markl et al., "M4: A Visualization-Oriented Time Series Data
Aggregation", VLDB 2014 — public literature): per (series, time bucket)
keep min, max, first and last values plus the first/last timestamps.
The paper's result is that these four points per pixel column are
SUFFICIENT for error-free line-chart rendering — which makes M4 the
downsampling operator a query engine should push down, unlike heuristic
selectors (LTTB) that need a sequential pass.

Scale shape: a single groupBy aggregate — min/max/min_by/max_by all
partially aggregate map-side, so the shuffle carries 4 values + 2
timestamps per bucket regardless of input rows. Pure JVM, codegen,
no window, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def m4_downsample(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    by: str | list[str] = "user_id",
    bucket_s: int = 3600,
    tiebreak: str | None = None,
) -> DataFrame:
    """M4 aggregate per (by, bucket of ``bucket_s`` seconds).

    Output: keys + ``bucket_start`` + ``n`` + ``v_min v_max v_first
    v_last ts_first ts_last``. first/last are ordered by timestamp
    (plus ``tiebreak`` when equal timestamps are possible — pass one
    unless the series is known tie-free, or first/last are
    nondeterministic under Spark's unordered aggregation).

    Buckets come from floor-division of unix microseconds (pre-epoch
    safe), returned as a timestamp.
    """
    keys = [by] if isinstance(by, str) else list(by)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket_us = bucket_s * 1_000_000
    bucket = (F.floor(us / bucket_us) * bucket_us).cast("long")
    ordk = us if tiebreak is None else F.struct(us, F.col(tiebreak))
    v = F.col(value_col)
    return (
        df.groupBy(*keys, F.timestamp_micros(bucket).alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
            F.min_by(v, ordk).alias("v_first"),
            F.max_by(v, ordk).alias("v_last"),
            F.min(F.col(ts_col).cast("timestamp")).alias("ts_first"),
            F.max(F.col(ts_col).cast("timestamp")).alias("ts_last"),
        )
    )
