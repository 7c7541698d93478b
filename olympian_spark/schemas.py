"""Engine schemas.

Everything is long-format DataFrames; value columns that feed QC math are
FloatType (f32) for reference bit-parity (SURVEY §1.4, §7.4).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Primary input (BASELINE input_hint): multi-turn agent transcripts.
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# SeriesCache image: dense regular spine, NULL value == gap (util/mod.rs:41-60)
SERIES_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType(), False),
        T.StructField("spine_idx", T.LongType(), False),
        T.StructField("spine_ts", T.TimestampType(), False),
        T.StructField("value", T.FloatType(), True),
    ]
)

# SpatialCache image: one QC slice = one slice_key group (util/mod.rs:62-92)
STATIONS_SCHEMA = T.StructType(
    [
        T.StructField("slice_key", T.StringType(), False),
        T.StructField("station_idx", T.IntegerType(), False),
        T.StructField("lat", T.FloatType(), False),
        T.StructField("lon", T.FloatType(), False),
        T.StructField("elev", T.FloatType(), True),
        T.StructField("value", T.FloatType(), True),
        T.StructField("obs_to_check", T.BooleanType(), True),
    ]
)

# Rollup tier row (1m/1h/1d). Gorilla block only at the finest tier.
TIER_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("bucket_start", T.TimestampType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_qc_fail", T.LongType(), False),
        T.StructField("n_gap_obs", T.LongType(), False),
        T.StructField("sum_gap", T.FloatType(), True),
        T.StructField("mean_gap", T.FloatType(), True),
        T.StructField("p95_gap", T.FloatType(), True),
        T.StructField("sum_text_len", T.LongType(), True),
        T.StructField("mean_text_len", T.FloatType(), True),
        T.StructField("block", T.BinaryType(), True),  # Gorilla block (1m only)
    ]
)

# Manifest row: per-partition lineage + metrics for checkpoint/resume.
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType(), False),
        T.StructField("partition_value", T.StringType(), False),
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("input_watermark", T.StringType(), True),
        T.StructField("rows", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("wall_s", T.DoubleType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)
