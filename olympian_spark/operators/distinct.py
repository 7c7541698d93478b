"""Mergeable distinct-count tiers (HyperLogLog sketches).

The tier cascade (rollup.py) combines decomposable measures — sums,
counts, min/max — by adding partials, and exact p95 by concatenating
value blocks. Distinct counts are neither: ``n_distinct_users`` per hour
cannot be summed into per day, and storing raw member sets defeats the
tier's whole point. The standard warehouse answer is a MERGEABLE sketch
column: each finest-tier bucket stores a HyperLogLog sketch of its keys;
coarser tiers union member sketches (register-wise max — associative,
commutative, idempotent), so every tier answers "how many distinct X"
within a known error without ever rescanning raw data.

Spark-first shape: the built-in Apache DataSketches HLL aggregates
(``hll_sketch_agg`` / ``hll_union_agg``, JVM-side ImperativeAggregates
with map-side partial merge) do all the work — ONE shuffle per tier
moving only (bucket, ≤~2^lg_k-byte sketch) pairs regardless of input
row count, and the 1m→1h→1d cascade never touches raw events again.
At lg_k=12 the relative standard error is 1.04/√2¹² ≈ 1.6%; estimates
are exact in sparse mode at the small cardinalities tests use.

Public surface:
- :func:`distinct_rollup` — raw rows → finest tier of sketches
- :func:`distinct_coarser` — finer tier → coarser tier (sketch union)
- :func:`with_distinct_estimate` — materialize the count estimate

No reference analogue (the reference keeps only decomposable measures in
its tiers); this extends the tier model the way a 100 TB deployment
needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# same grain vocabulary as rollup.py
_GRAIN = {"minute": "minute", "hour": "hour", "day": "day",
          "week": "week", "month": "month"}


def distinct_rollup(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    grain: str = "minute",
    dims: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Finest distinct tier: one row per (dims..., bucket_start) holding
    ``n_rows`` and an HLL sketch of ``key_col``.

    One hash shuffle on the group keys; sketches partially aggregate
    map-side, so shuffle bytes are O(buckets × sketch), independent of
    input rows. ``lg_k`` must be held constant across every tier that
    will ever be unioned (DataSketches unions sketches of equal lg_k).
    """
    dims = dims or []
    bucket = F.date_trunc(_GRAIN[grain], F.col(ts_col).cast("timestamp"))
    return (
        df.groupBy(*dims, bucket.alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("distinct_sketch"),
        )
    )


def distinct_coarser(
    tier: DataFrame, grain: str, dims: list[str] | None = None
) -> DataFrame:
    """Coarser distinct tier from a finer one: union member sketches.

    Register-wise max is associative and idempotent, so any cascade path
    (1m→1d directly, or 1m→1h→1d) yields the same registers — estimates
    are path-independent by construction. Input rows are tier rows (tiny
    vs raw), shuffled once on the coarser keys.
    """
    dims = dims or []
    bucket = F.date_trunc(_GRAIN[grain], F.col("bucket_start"))
    return (
        tier.groupBy(*dims, bucket.alias("bucket_start"))
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.hll_union_agg("distinct_sketch").alias("distinct_sketch"),
        )
    )


def with_distinct_estimate(tier: DataFrame, out_col: str = "n_distinct") -> DataFrame:
    """Materialize the distinct-count estimate (rounded to long) from the
    sketch column. Keeps the sketch: downstream merges still work."""
    return tier.withColumn(
        out_col,
        F.round(F.hll_sketch_estimate("distinct_sketch")).cast("long"),
    )
