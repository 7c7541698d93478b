"""As-of join: attach to each left row the most recent right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN; the naive equi-join + range filter explodes
quadratically on busy keys. This implementation is the union-LOCF form —
the Spark-idiomatic O(n log n) plan:

    1. union the tagged left/right rows,
    2. one window per key ordered by (ts, side) carrying
       ``last(right_payload, ignorenulls=True)`` forward,
    3. keep left rows.

One shuffle on the key, no join at all, skew-bounded by the per-key window
(same partitioning the rest of the engine reuses). Right rows sort before
left rows at equal timestamps, so an exactly-simultaneous right row IS
visible to the left row (<= semantics, matching DuckDB ASOF JOIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Returns ``left`` with ``<payload><suffix>`` columns from the latest
    ``right`` row with ``right.ts <= left.ts`` on the same key (NULL when
    no prior right row exists).

    ``tolerance_s`` (pandas ``merge_asof(tolerance=...)`` semantics):
    a match older than the tolerance yields NULL payloads instead — the
    carried right timestamp rides the same window, so the bound costs no
    extra shuffle."""
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    lcols = [c for c in left.columns]

    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),  # left sorts after right at equal ts
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
        F.col(right_ts).alias("_rts"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in payload_cols
        ],
        F.last("_rts", ignorenulls=True).over(w).alias("_f_rts"),
    )

    def _num(c):
        from pyspark.sql.types import TimestampNTZType, TimestampType

        dt = left.schema[left_ts].dataType
        if isinstance(dt, (TimestampType, TimestampNTZType)):
            return F.unix_micros(c.cast("timestamp")).cast("double") / 1e6
        return c.cast("double")

    within = (
        F.lit(True)
        if tolerance_s is None
        else (_num(F.col("_t")) - _num(F.col("_f_rts")) <= F.lit(float(tolerance_s)))
    )
    out = filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[
            F.when(within, F.col(f"_f_{c}")).alias(f"{c}{suffix}")
            for c in payload_cols
        ],
    )
    return out
