"""Rollup tier cascade: 1m -> 1h -> 1d continuous aggregates.

Semantics (SURVEY §2.9, north star):

- tumbling windows on ts, keys (conv_id, bucket_start);
- measures: n_turns, n_qc_fail, counts/sums/means of turn_gap_s and
  text_len, **exact p95** of turn_gap_s via the reference quantile kernel
  (f32 linear interpolation, sct.rs:70-103) — never percentile_approx;
- QC-before-rollup: rows whose fail_flag column == Flag.FAIL are excluded
  from measures but counted in n_qc_fail (Warn rows are retained — the
  reference treats Warn as "inside warning threshold", not rejection);
- every tier carries a Gorilla block of its member (ts, turn_gap, text_len)
  points, so each coarser tier is refreshed *from the finer tier alone*:
  decomposable measures add up partial sums (float64 accumulate -> f32,
  deterministic at f32 precision), p95 re-computes from decoded blocks.

Execution shape (the scale story):

- Arrow kernels are **chunked**: one group = one (conv_id, chunk) where the
  chunk is a coarse calendar unit (default day), and the kernel emits one
  row per member bucket. This amortizes Spark's per-group and pandas'
  per-DataFrame overhead over hundreds of buckets — the difference between
  18k kernel calls and 300 at sf-small, and between 10^9 and 10^7 calls at
  10^12 turns.
- a hot conversation splits across chunks, so kernel groups stay bounded
  (one conv-day); the pure-relational dimension rollups absorb skew via
  map-side partial aggregation, and :func:`salted_agg` provides two-stage
  aggregation for demonstrably-equivalent skew handling on arbitrary keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olympian_spark.flags import Flag
from olympian_spark.functions.gorilla import decode_block, encode_block
from olympian_spark.oracle.quantile import compute_quantile

F32 = np.float32

_TIER_SCHEMA = (
    "conv_id string, bucket_start timestamp, n_turns long, n_qc_fail long,"
    " n_gap_obs long, n_valid_gap long, sum_gap float, mean_gap float,"
    " p95_gap float, sum_text_len long, mean_text_len float, block binary"
)

# kernel-internal schema: bucket as int64 µs — tz-aware timestamps crossing
# the Arrow<->pandas boundary cost ~ms per batch; a long is free. The public
# timestamp column is restored JVM-side with timestamp_micros.
_TIER_SCHEMA_US = _TIER_SCHEMA.replace("bucket_start timestamp", "bucket_us long")


def _restore_bucket(df: DataFrame) -> DataFrame:
    cols = [
        F.timestamp_micros(F.col("bucket_us")).alias("bucket_start")
        if c == "bucket_us"
        else F.col(c)
        for c in df.columns
    ]
    return df.select(*cols)

_GRAIN = {"minute": "minute", "hour": "hour", "day": "day", "week": "week", "month": "month"}


def _tier_row(conv_id, bucket, n_turns, n_fail, ts_us, gaps, tl):
    """One tier row from the QC-passing member points (f32 oracle math).

    Fast path for single-point buckets (the common case at 1m grain):
    sum == mean == p95 == the value, no sort/quantile call.
    """
    n_ok = tl.size
    if n_ok == 1:
        g0 = gaps[0]
        has_gap = bool(np.isfinite(g0))
        v = F32(g0) if has_gap else None
        t0 = F32(tl[0])
        return {
            "conv_id": conv_id,
            "bucket_us": bucket,
            "n_turns": int(n_turns),
            "n_qc_fail": int(n_fail),
            "n_gap_obs": 0 if has_gap else 1,
            "n_valid_gap": 1 if has_gap else 0,
            "sum_gap": v,
            "mean_gap": v,
            "p95_gap": v,
            "sum_text_len": int(t0),
            "mean_text_len": t0,
            "block": encode_block(ts_us, [gaps, tl]),
        }
    valid = gaps[np.isfinite(gaps)]
    n_valid = valid.size
    if n_valid:
        sum_gap = F32(np.sum(valid, dtype=F32))
        mean_gap = F32(sum_gap / F32(n_valid))
        p95_gap = compute_quantile(0.95, valid)
    else:
        sum_gap = mean_gap = p95_gap = None
    return {
        "conv_id": conv_id,
        "bucket_us": bucket,
        "n_turns": int(n_turns),
        "n_qc_fail": int(n_fail),
        "n_gap_obs": int(np.isnan(gaps).sum()),
        "n_valid_gap": int(n_valid),
        "sum_gap": sum_gap,
        "mean_gap": mean_gap,
        "p95_gap": p95_gap,
        "sum_text_len": int(tl.sum()),
        "mean_text_len": F32(F32(np.sum(tl, dtype=F32)) / F32(n_ok)) if n_ok else None,
        "block": encode_block(ts_us, [gaps, tl]),
    }


def rollup_1m(
    df: DataFrame,
    fail_flag_col: str | None = "flag_dip",
    grain: str = "minute",
    chunk_grain: str = "day",
) -> DataFrame:
    """Finest tier from raw turns.

    Input: transcripts with turn metrics (turn_gap_s, text_len) and QC flag
    columns. One shuffle on (conv_id, chunk); the Arrow kernel walks the
    chunk's member buckets in turn order and emits one tier row per bucket.
    NULL gap (first turn) is carried as NaN so the turn's text_len still
    lands in the block; the quantile kernel drops non-finite exactly like
    the reference (sct.rs:71-75).
    """
    ts = F.col("ts").cast("timestamp")
    fail = (
        (F.col(fail_flag_col) == int(Flag.FAIL)).cast("int")
        if fail_flag_col
        else F.lit(0)
    )
    base = df.select(
        "conv_id",
        F.unix_micros(F.date_trunc(_GRAIN[grain], ts)).alias("bucket_us"),
        F.unix_micros(F.date_trunc(_GRAIN[chunk_grain], ts)).alias("_chunk"),
        F.col("turn_idx"),
        F.unix_micros(ts).alias("_ts_us"),
        F.col("turn_gap_s"),
        F.col("text_len"),
        fail.alias("_is_fail"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # ts is monotone in turn_idx per conversation, so sorting by turn_idx
        # also orders buckets; bucket boundaries come from one vectorized diff
        order = np.argsort(pdf["turn_idx"].to_numpy(), kind="stable")
        conv = pdf["conv_id"].iat[0]
        buckets = pdf["bucket_us"].to_numpy(np.int64)[order]
        ts_us = pdf["_ts_us"].to_numpy(np.int64)[order]
        gaps = pdf["turn_gap_s"].to_numpy(F32)[order]  # NULL -> NaN
        tl = pdf["text_len"].to_numpy(F32)[order]
        ok = (pdf["_is_fail"].to_numpy() != 1)[order]
        n = buckets.size
        starts = np.concatenate(
            ([0], np.flatnonzero(buckets[1:] != buckets[:-1]) + 1, [n])
        )
        rows = []
        for k in range(starts.size - 1):
            lo, hi = starts[k], starts[k + 1]
            m = ok[lo:hi]
            rows.append(
                _tier_row(
                    conv,
                    int(buckets[lo]),
                    hi - lo,
                    (hi - lo) - int(m.sum()),
                    ts_us[lo:hi][m],
                    gaps[lo:hi][m],
                    tl[lo:hi][m],
                )
            )
        return pd.DataFrame(rows)

    return _restore_bucket(
        base.groupBy("conv_id", "_chunk").applyInPandas(kernel, _TIER_SCHEMA_US)
    )


def rollup_coarser(tier: DataFrame, grain: str, chunk_grain: str | None = None) -> DataFrame:
    """Coarser tier from a finer tier (1m -> 1h, 1h -> 1d).

    Decomposable measures combine the finer tier's partial sums/counts
    (float64 accumulate, cast to f32 — order differences vanish below f32
    precision); exact p95 and the tier's own Gorilla block come from
    decoding + concatenating member blocks in bucket order. One shuffle on
    (conv_id, chunk); chunk defaults to the target grain's natural parent
    (day), and the kernel emits one row per coarse bucket.
    """
    chunk_grain = chunk_grain or "day"
    bs = F.col("bucket_start")
    base = tier.select(
        "conv_id",
        F.unix_micros(bs).alias("bucket_us"),
        "n_turns",
        "n_qc_fail",
        "n_gap_obs",
        "n_valid_gap",
        "sum_gap",
        "sum_text_len",
        "block",
        F.unix_micros(F.date_trunc(_GRAIN[grain], bs)).alias("_coarse"),
        F.unix_micros(F.date_trunc(_GRAIN[chunk_grain], bs)).alias("_chunk"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["bucket_us"].to_numpy(np.int64), kind="stable")
        conv = pdf["conv_id"].iat[0]
        coarse = pdf["_coarse"].to_numpy(np.int64)[order]
        n_turns = pdf["n_turns"].to_numpy(np.int64)[order]
        n_fail = pdf["n_qc_fail"].to_numpy(np.int64)[order]
        n_valid_a = pdf["n_valid_gap"].to_numpy(np.int64)[order]
        sum_gap_a = pdf["sum_gap"].to_numpy(np.float64)[order]
        sum_tl_a = pdf["sum_text_len"].to_numpy(np.int64)[order]
        blocks = pdf["block"].to_numpy(object)[order]
        n = coarse.size
        starts = np.concatenate(
            ([0], np.flatnonzero(coarse[1:] != coarse[:-1]) + 1, [n])
        )
        rows = []
        for k in range(starts.size - 1):
            lo, hi = starts[k], starts[k + 1]
            decoded = [decode_block(bytes(b)) for b in blocks[lo:hi]]
            ts_us = np.concatenate([d[0] for d in decoded])
            gaps = np.concatenate([d[1][0] for d in decoded])
            tl = np.concatenate([d[1][1] for d in decoded])
            row = _tier_row(
                conv,
                int(coarse[lo]),
                n_turns[lo:hi].sum(),
                n_fail[lo:hi].sum(),
                ts_us,
                gaps,
                tl,
            )
            # decomposable sums override the decode-path values: partial+final
            # float64 accumulation of the finer tier's f32 partials
            n_valid = int(n_valid_a[lo:hi].sum())
            row["n_valid_gap"] = n_valid
            if n_valid:
                row["sum_gap"] = F32(np.nansum(sum_gap_a[lo:hi]))
                row["mean_gap"] = F32(row["sum_gap"] / F32(n_valid))
            row["sum_text_len"] = int(sum_tl_a[lo:hi].sum())
            rows.append(row)
        return pd.DataFrame(rows)

    return _restore_bucket(
        base.groupBy("conv_id", "_chunk").applyInPandas(kernel, _TIER_SCHEMA_US)
    )


def rollup_by_dimension(
    df: DataFrame, dim_col: str, grain: str = "hour"
) -> DataFrame:
    """Per-role / per-tool rollups — pure relational (JVM, codegen).

    groupBy(bucket, dim): turn counts + mean text_len (double precision,
    SQL-oracle-checkable). Salt-free: dimension cardinality is tiny and
    map-side partial aggregation absorbs the skew.
    """
    bucket = F.date_trunc(_GRAIN[grain], F.col("ts").cast("timestamp"))
    return (
        df.groupBy(bucket.alias("bucket_start"), F.col(dim_col))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.round(F.avg(F.col("text_len").cast("double")), 6).alias("mean_text_len"),
        )
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_alias: str = "n",
    salt_buckets: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-stage aggregation under key skew: partial agg on (keys + salt),
    final agg on keys. Result is identical to a plain groupBy for
    sums/counts (associative); the partial stage spreads a hot key over
    ``salt_buckets`` reducers.

    ``sum_cols``: {output_alias: input_col}. Salt defaults to a hash of a
    uniformly-distributed source column (or a partition-derived fallback).
    """
    salt = (
        F.pmod(
            F.hash(salt_source if isinstance(salt_source, Column) else F.col(salt_source)),
            F.lit(salt_buckets),
        )
        if salt_source is not None
        else F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_pc"),
            *[F.sum(src).alias(f"_ps_{alias}") for alias, src in sum_cols.items()],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_pc").alias(count_alias),
        *[F.sum(f"_ps_{alias}").alias(alias) for alias in sum_cols],
    )
