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


def with_gap_and_dip_parallel(
    df: DataFrame,
    dip_high: float,
    dip_max: float,
    n_part: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """``turn_gap_s`` + ``flag_dip`` without per-conversation windows: a
    RANGE-partitioned parallel sort plus a 2-row boundary stitch.

    The window formulation (:func:`dip_flag`) requires every conversation in
    ONE partition, so a pathologically hot conversation serializes the sort
    and the whole tier pipeline behind one task (measured: a 64M-turn input
    whose two largest conversations hold 91% of rows spent 146s of a 223s
    pipeline in that straggler). But gap and dip are 2-/5-row stencils in
    turn order — they need only each row's ±2 neighbours, not the whole
    conversation. So:

    1. ``repartitionByRange(conv_id, turn_idx)`` + local sort: the global
       sort parallelizes across ALL partitions (a hot conversation spreads);
       persisted, because range boundaries are sampled per execution and
       both following passes must see identical partitions.
    2. A boundary pass collects each partition's first/last two rows
       (bounded driver collect: 4 rows x n_part).
    3. A whole-partition ``mapInArrow`` computes gaps and dip flags
       vectorized, stitching each partition's edge rows with its
       neighbours' context rows; conversation changes mask the stencil
       exactly like the window's partition bound.

    Flag parity contract: gap series derived from timestamps carry no
    genuine NaNs, so SQL NULL (no neighbour) and NaN coincide and the
    emitted flag matches :func:`dip_flag` exactly (tested); downstream tier
    kernels only consume ``flag_dip == FAIL`` and treat NULL/NaN gaps
    identically, so tiers are bit-identical either way.

    Returns ``(flagged, sorted_handle)`` — unpersist the handle when done.
    """
    import numpy as np
    import pyarrow as pa

    spark = df.sparkSession
    if n_part is None:
        n_part = 2 * spark.sparkContext.defaultParallelism
    cols = df.columns
    F32 = np.float32

    srt = (
        df.withColumn("_ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .repartitionByRange(n_part, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .persist()
    )

    # ---- pass 1: per-partition edge rows (first/last 2) -------------------
    def edge_fn(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        first: list = []
        last: list = []
        for rb in batches:
            if rb.num_rows == 0:
                continue
            t = pa.Table.from_batches([rb])
            conv = t.column("conv_id").to_pylist()
            ts = t.column("_ts_us").to_pylist()
            rows = list(zip(conv, ts))
            if len(first) < 2:
                first.extend(rows[: 2 - len(first)])
            last = (last + rows)[-2:]
        if first:
            out = pa.table(
                {
                    "pid": pa.array([pid] * (len(first) + len(last)), pa.int32()),
                    "kind": pa.array(["f"] * len(first) + ["l"] * len(last)),
                    "idx": pa.array(
                        list(range(len(first))) + list(range(len(last))), pa.int32()
                    ),
                    "conv_id": pa.array([r[0] for r in first + last]),
                    "ts_us": pa.array([r[1] for r in first + last], pa.int64()),
                }
            )
            yield from out.to_batches()

    edge_schema = (
        "pid int, kind string, idx int, "
        f"conv_id {dict(srt.dtypes)['conv_id']}, ts_us long"
    )
    edges = srt.select("conv_id", "_ts_us").mapInArrow(edge_fn, edge_schema).collect()
    firsts: dict[int, list] = {}
    lasts: dict[int, list] = {}
    for r in edges:
        d = firsts if r["kind"] == "f" else lasts
        d.setdefault(r["pid"], []).append((r["idx"], r["conv_id"], r["ts_us"]))
    for d in (firsts, lasts):
        for p in d:
            d[p] = [(c, t) for _, c, t in sorted(d[p])]

    # leading context = the 2 rows globally preceding each partition's first
    # row; trailing = the 2 rows following its last (walk over neighbours,
    # skipping empty partitions)
    ctx: dict[int, tuple[list, list]] = {}
    pids = sorted(set(firsts))
    for p in pids:
        lead: list = []
        for q in range(p - 1, -1, -1):
            if q in lasts:
                lead = (lasts[q] + lead)[-2:] if lead else lasts[q][-2:]
                if len(lead) >= 2:
                    break
        trail: list = []
        for q in range(p + 1, n_part):
            if q in firsts:
                trail = (trail + firsts[q])[:2]
                if len(trail) >= 2:
                    break
        ctx[p] = (lead, trail)

    # ---- pass 2: vectorized stencil over the sorted partitions ------------
    high_f = F32(dip_high)
    max_f = F32(dip_max)

    def _flags(conv_codes, ts):
        n = conv_codes.size
        same_prev = np.zeros(n, bool)
        same_prev[1:] = conv_codes[1:] == conv_codes[:-1]
        gap = np.full(n, np.nan, F32)
        gap[1:] = ((ts[1:] - ts[:-1]).astype(np.float64) / 1e6).astype(F32)
        gap[~same_prev] = np.nan
        d0 = np.full(n, np.nan, F32)
        d0[1:] = gap[:-1]
        d0[~same_prev] = np.nan
        d2 = np.full(n, np.nan, F32)
        d2[:-1] = gap[1:]
        same_next = np.zeros(n, bool)
        same_next[:-1] = same_prev[1:]
        d2[~same_next] = np.nan
        d1 = gap
        with np.errstate(invalid="ignore"):
            a = np.abs(d2 - d1)
            b = np.abs(d1 - d0)
            diffsum = np.abs(a + b)
            diffdiff = np.abs(a - b)
            extremum = ((d2 < d1) & (d0 < d1)) | ((d2 > d1) & (d0 > d1))
            inner = extremum & (diffdiff < diffsum * F32(0.35))
            missing = np.isnan(d0) | np.isnan(d1) | np.isnan(d2)
            flag = np.where(
                missing,
                np.int8(int(Flag.DATA_MISSING)),
                np.where(
                    inner & (diffsum > max_f),
                    np.int8(int(Flag.FAIL)),
                    np.where(
                        inner & (diffsum > high_f),
                        np.int8(int(Flag.WARN)),
                        np.int8(int(Flag.PASS)),
                    ),
                ),
            ).astype(np.int8)
        return gap, flag

    def stencil_fn(batches):
        import pyarrow.compute as pc
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        lead, trail = ctx.get(pid, ([], []))

        def emit(tbl: "pa.Table", lctx_rows: list, trail_rows: list,
                 hold_back: bool):
            """Flags for tbl's rows using lctx/trail context; returns
            (emitted_table, new_lctx, held_table)."""
            n_l = len(lctx_rows)
            ctype = tbl.column("conv_id").type
            conv_ext = pa.chunked_array(
                [pa.array([c for c, _ in lctx_rows], ctype)]
                + list(tbl.column("conv_id").chunks)
                + [pa.array([c for c, _ in trail_rows], ctype)]
            )
            ts_ext = np.concatenate(
                (
                    np.array([t for _, t in lctx_rows], np.int64),
                    tbl.column("_ts_us").combine_chunks()
                    .to_numpy(zero_copy_only=False).astype(np.int64, copy=False),
                    np.array([t for _, t in trail_rows], np.int64),
                )
            )
            codes = (
                pc.dictionary_encode(conv_ext).combine_chunks().indices
                .to_numpy(zero_copy_only=False)
            )
            gap, flag = _flags(codes, ts_ext)
            n_own = tbl.num_rows
            cut = n_own - 2 if hold_back else n_own
            if cut <= 0:
                return None, lctx_rows, tbl
            own_gap = gap[n_l : n_l + cut]
            own_flag = flag[n_l : n_l + cut]
            out = tbl.slice(0, cut).append_column(
                "turn_gap_s", pa.array(own_gap, pa.float32())
            ).append_column("flag_dip", pa.array(own_flag, pa.int8()))
            held = tbl.slice(cut)
            conv_own = tbl.column("conv_id").to_pylist()[:cut]
            ts_own = (
                tbl.column("_ts_us").combine_chunks()
                .to_numpy(zero_copy_only=False)[:cut]
            )
            new_lctx = (
                lctx_rows + [(c, int(t)) for c, t in zip(conv_own, ts_own)]
            )[-2:]
            return out, new_lctx, held

        lctx = list(lead)
        held: "pa.Table | None" = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb])
            if held is not None:
                tbl = pa.concat_tables([held, tbl]).combine_chunks()
            out, lctx, held = emit(tbl, lctx, [], hold_back=True)
            if out is not None:
                yield from out.to_batches()
        if held is not None and held.num_rows:
            out, _, _ = emit(held.combine_chunks(), lctx, list(trail),
                             hold_back=False)
            if out is not None:
                yield from out.to_batches()

    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in srt.dtypes
    ) + ", turn_gap_s float, flag_dip tinyint"
    flagged = srt.mapInArrow(stencil_fn, out_schema)
    return flagged, srt
