"""End-to-end rollup pipeline (SURVEY §3.4).

transcripts
  -> stage 1 (shuffle on conv_id): stable turn ordering + derived metrics
     (turn_gap_s, text_len) + step/dip/flatline QC flags — all in ONE window
     stage: every window uses the same (conv_id | turn_idx) spec, so Catalyst
     plans a single Exchange + Sort and evaluates the flags in one pass
  -> stage 2 (shuffle on (conv_id, 1m bucket)): tier-1m Arrow kernel —
     f32 measures + exact p95 + Gorilla block
  -> stage 3/4: 1h from 1m, 1d from 1h (partial+final decomposition; p95
     from decoded blocks)
  -> dimension rollups (role/tool) straight from stage 1 output.

QC policy: dip_check FAIL excludes a turn from measures (spike = bad
latency sample); step/flatline flags are carried for flag-distribution
reporting. All thresholds are explicit parameters.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from olympian_spark.operators.qc_series import dip_flag, step_flag, with_flatline_flag
from olympian_spark.operators.rollup import (
    rollup_1m,
    rollup_by_dimension,
    rollup_coarser,
    rollup_dims_fused,
    rollup_tiers_fused,
)
from olympian_spark.sources.transcripts import with_turn_metrics


@dataclass
class QcParams:
    step_high: float = 3600.0  # gap jump [s] flagged Warn (reference bug: Warn first)
    step_max: float = 21600.0
    dip_high: float = 1800.0
    dip_max: float = 7200.0
    flatline_min_run: int = 8


def qc_flags(df: DataFrame, params: QcParams = QcParams()) -> DataFrame:
    """Stage-1 output: metrics + all QC flag columns on the turn stream."""
    m = with_turn_metrics(df)
    m = m.withColumn(
        "flag_step",
        step_flag("turn_gap_s", "conv_id", "turn_idx", params.step_high, params.step_max),
    ).withColumn(
        "flag_dip",
        dip_flag("turn_gap_s", "conv_id", "turn_idx", params.dip_high, params.dip_max),
    )
    return with_flatline_flag(
        m, "turn_gap_s", "conv_id", "turn_idx", params.flatline_min_run
    )


def build_tiers(
    df: DataFrame,
    params: QcParams = QcParams(),
    persist: bool | str = True,
    fused: bool = True,
) -> dict[str, DataFrame]:
    """All tier tables from a transcripts DataFrame.

    ``persist`` materializes each tier before the next consumes it — the
    cascade (and the dimension rollups) would otherwise recompute the whole
    upstream DAG per output. Values: True -> ``.persist()`` (lineage kept:
    an executor loss recomputes, the right default on clusters);
    ``"checkpoint"`` -> ``localCheckpoint(eager)`` (~30% faster
    materialization, no lineage — fine in local mode / with job-level
    resume via the catalog); False -> rely on the caller's write barriers.

    ``fused`` (default): compute all three tiers in ONE shuffle + kernel
    pass (rollup_tiers_fused) and split the tagged result — bit-identical
    to the cascade (tested) with two fewer wide stages and two fewer
    materialization barriers. ``fused=False`` keeps the explicit
    1m -> 1h -> 1d cascade (the partial+final decomposition path, still
    what incremental per-tier refresh of ONLY a coarse tier would use).
    """
    flagged = qc_flags(df, params)
    # the materialized projection carries ONLY what the tiers consume:
    # no `text` (caching megabytes of strings costs more than recomputing
    # the codegen'd window), and no flag_step/flag_flatline — tier measures
    # filter on flag_dip alone, and column pruning then lets Catalyst drop
    # the flatline check's second window (cumsum run-ids + a per-run count
    # needs an extra sort pass over every turn). Consumers that want the
    # full flag set read `turns_flagged`, which keeps all three lazily.
    slim = flagged.select(
        "conv_id", "turn_idx", "ts", "role", "tool",
        "turn_gap_s", "text_len", "flag_dip",
    )

    def mat(d):
        if persist == "checkpoint":
            return d.localCheckpoint(eager=True)
        return d.persist() if persist else d

    slim = mat(slim)
    if fused:
        tagged = mat(rollup_tiers_fused(slim, fail_flag_col="flag_dip"))
        t1m = tagged.filter("_grain = 0").drop("_grain")
        t1h = tagged.filter("_grain = 1").drop("_grain")
        t1d = tagged.filter("_grain = 2").drop("_grain")
    else:
        t1m = mat(rollup_1m(slim, fail_flag_col="flag_dip"))
        t1h = mat(rollup_coarser(t1m, "hour"))
        t1d = rollup_coarser(t1h, "day")
    # dimension rollups stay one-groupBy-per-dimension: slim is persisted,
    # so the second scan is a cache read, and the fused explode alternative
    # (rollup_dims_fused) doubles the partial-agg input stream — measured
    # 3x slower at 16M turns/32 cores. Fusion only pays when the input is
    # NOT materialized (e.g. straight off a parquet scan).
    role_1h = rollup_by_dimension(slim, "role", "hour")
    tool_1h = rollup_by_dimension(slim, "tool", "hour")
    return {
        "turns_flagged": flagged,  # full width (text kept), not cached
        "_slim": slim,
        **({"_tagged": tagged} if fused else {}),
        "tier_1m": t1m,
        "tier_1h": t1h,
        "tier_1d": t1d,
        "rollup_role_1h": role_1h,
        "rollup_tool_1h": tool_1h,
    }
