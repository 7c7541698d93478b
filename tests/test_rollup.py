"""Tier cascade correctness (Tier B/C):

- tier_1m bit-matches an independent pandas/numpy oracle (f32 mean/p95)
- 1h sums == sum of member 1m sums; 1d == sum of member 1h sums
- 1h/1d p95 bit-match the oracle quantile over the raw passing gaps
- QC-before-rollup: FAIL rows excluded from measures, counted in n_qc_fail
- salted two-stage agg == plain groupBy
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from olympian_spark.datagen import gen_transcripts
from olympian_spark.flags import Flag
from olympian_spark.operators.rollup import salted_agg
from olympian_spark.oracle.quantile import compute_quantile
from olympian_spark.plans.pipeline import QcParams, build_tiers

F32 = np.float32
PARAMS = QcParams(dip_high=300.0, dip_max=1200.0)


@pytest.fixture(scope="module")
def tiers(spark):
    pdf = gen_transcripts(n_turns=20_000, n_convs=60, seed=42).to_pandas()
    df = spark.createDataFrame(pdf)
    out = build_tiers(df, PARAMS)
    collected = {
        k: out[k].toPandas()
        for k in ("turns_flagged", "tier_1m", "tier_1h", "tier_1d")
    }
    return pdf, collected


def _us(series):
    """Timestamps -> int64 microseconds regardless of pandas storage unit."""
    s = series.dt.tz_localize(None) if series.dt.tz is not None else series
    return s.astype("datetime64[us]").astype("int64")


def _oracle_turns(pdf):
    """Independent pandas recomputation of stage 1 + dip-fail policy."""
    rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        ts = _us(g["ts"]).to_numpy()
        gap = np.full(len(g), np.nan, dtype=F32)
        gap[1:] = ((ts[1:] - ts[:-1]) / 1e6).astype(F32)
        from olympian_spark.oracle import dip_check

        vals = [None if np.isnan(x) else float(x) for x in gap]
        # dip needs 1 lead + 1 trail context; edges are DATA_MISSING here
        flags = [int(Flag.DATA_MISSING)] * len(vals)
        if len(vals) >= 3:
            inner = dip_check(vals, 1, 1, PARAMS.dip_high, PARAMS.dip_max)
            flags[1:-1] = inner
        tl = g["text"].fillna("").str.len().to_numpy(F32)
        for i in range(len(g)):
            rows.append(
                (conv, int(g["turn_idx"].iloc[i]), ts[i], gap[i], tl[i], flags[i])
            )
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "ts_us", "gap", "tl", "flag_dip"]
    )


def test_stage1_flags_match_oracle(tiers):
    pdf, got = tiers
    oracle = _oracle_turns(pdf)
    sf = got["turns_flagged"][["conv_id", "turn_idx", "flag_dip"]]
    merged = oracle.merge(sf, on=["conv_id", "turn_idx"], suffixes=("_o", "_s"))
    assert len(merged) == len(oracle)
    assert (merged["flag_dip_o"] == merged["flag_dip_s"]).all()


def test_tier_1m_matches_oracle(tiers):
    pdf, got = tiers
    oracle = _oracle_turns(pdf)
    oracle["bucket"] = (oracle["ts_us"] // 60_000_000) * 60_000_000
    t1m = got["tier_1m"].copy()
    t1m["bucket"] = _us(t1m["bucket_start"])

    exp = {}
    for (conv, bucket), g in oracle.groupby(["conv_id", "bucket"]):
        ok = g[g["flag_dip"] != int(Flag.FAIL)]
        gaps = ok["gap"].to_numpy(F32)
        valid = gaps[np.isfinite(gaps)]
        exp[(conv, bucket)] = dict(
            n_turns=len(g),
            n_qc_fail=int((g["flag_dip"] == int(Flag.FAIL)).sum()),
            n_valid=len(valid),
            mean_gap=(
                F32(F32(np.sum(valid, dtype=F32)) / F32(len(valid)))
                if len(valid)
                else None
            ),
            p95=compute_quantile(0.95, valid) if len(valid) else None,
        )
    assert len(t1m) == len(exp)
    n_fail_total = 0
    for r in t1m.itertuples():
        e = exp[(r.conv_id, r.bucket)]
        assert r.n_turns == e["n_turns"]
        assert r.n_qc_fail == e["n_qc_fail"]
        assert r.n_valid_gap == e["n_valid"]
        if e["mean_gap"] is None:
            assert pd.isna(r.mean_gap)
        else:
            # bit-exact f32
            assert F32(r.mean_gap).view(np.uint32) == e["mean_gap"].view(np.uint32)
            assert F32(r.p95_gap).view(np.uint32) == e["p95"].view(np.uint32)
        n_fail_total += r.n_qc_fail
    assert n_fail_total > 0, "fixture too tame: no QC fails"


def _check_tier_consistency(fine, coarse, trunc):
    fine = fine.copy()
    fine["cb"] = fine["bucket_start"].dt.floor(trunc)
    agg = fine.groupby(["conv_id", "cb"]).agg(
        n_turns=("n_turns", "sum"),
        n_qc_fail=("n_qc_fail", "sum"),
        n_valid_gap=("n_valid_gap", "sum"),
        sum_text_len=("sum_text_len", "sum"),
    )
    assert len(agg) == len(coarse)
    for r in coarse.itertuples():
        e = agg.loc[(r.conv_id, r.bucket_start)]
        assert r.n_turns == e["n_turns"]
        assert r.n_qc_fail == e["n_qc_fail"]
        assert r.n_valid_gap == e["n_valid_gap"]
        assert r.sum_text_len == e["sum_text_len"]


def test_tier_cascade_consistency(tiers):
    _, got = tiers
    _check_tier_consistency(got["tier_1m"], got["tier_1h"], "h")
    _check_tier_consistency(got["tier_1h"], got["tier_1d"], "D")


def test_coarse_p95_exact_from_blocks(tiers):
    pdf, got = tiers
    oracle = _oracle_turns(pdf)
    oracle["hb"] = (oracle["ts_us"] // 3_600_000_000) * 3_600_000_000
    t1h = got["tier_1h"].copy()
    t1h["hb"] = _us(t1h["bucket_start"])
    checked = 0
    for (conv, hb), g in oracle.groupby(["conv_id", "hb"]):
        ok = g[g["flag_dip"] != int(Flag.FAIL)]
        gaps = ok["gap"].to_numpy(F32)
        valid = gaps[np.isfinite(gaps)]
        if not len(valid):
            continue
        row = t1h[(t1h.conv_id == conv) & (t1h.hb == hb)]
        assert len(row) == 1
        got_p95 = F32(row["p95_gap"].iloc[0])
        assert got_p95.view(np.uint32) == compute_quantile(0.95, valid).view(np.uint32)
        checked += 1
    assert checked > 50


def test_salted_agg_equivalence(spark):
    df = spark.createDataFrame(
        gen_transcripts(n_turns=30_000, n_convs=30, seed=3).to_pandas()
    ).withColumn("text_len", F.length("text").cast("double"))
    plain = (
        df.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("text_len").alias("s"))
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    salted = (
        salted_agg(df, ["conv_id"], {"s": "text_len"}, salt_source="turn_idx")
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert (plain["n"] == salted["n"]).all()
    assert np.allclose(plain["s"], salted["s"], rtol=1e-12)


def test_fused_tiers_bit_identical_to_cascade(spark):
    """rollup_tiers_fused must reproduce the explicit 1m->1h->1d cascade
    bit-for-bit on every column including f32 measures and block bytes:
    the fused kernel reuses the finer tier's f32 partial sums exactly as
    rollup_coarser does (f64 accumulate of f32 partials)."""
    from olympian_spark.operators.rollup import (
        rollup_1m,
        rollup_coarser,
        rollup_tiers_fused,
    )
    from olympian_spark.plans.pipeline import qc_flags

    df = spark.createDataFrame(gen_transcripts(30_000, 60, seed=11).to_pandas())
    flagged = qc_flags(df, QcParams(dip_high=300.0, dip_max=1200.0))
    slim = flagged.select(
        "conv_id", "turn_idx", "ts", "turn_gap_s", "text_len", "flag_dip"
    )

    tagged = rollup_tiers_fused(slim).persist()
    t1m_c = rollup_1m(slim).persist()
    cascade = {
        0: t1m_c,
        1: rollup_coarser(t1m_c, "hour").persist(),
    }
    cascade[2] = rollup_coarser(cascade[1], "day")

    import numpy as np

    for g, casc in cascade.items():
        a = (
            tagged.filter(f"_grain = {g}").drop("_grain")
            .orderBy("conv_id", "bucket_start").toPandas()
        )
        b = casc.orderBy("conv_id", "bucket_start").toPandas()
        assert len(a) == len(b) and len(a) > 0, f"grain {g}: row count"
        for col in a.columns:
            av, bv = a[col].to_numpy(), b[col].to_numpy()
            if av.dtype == np.float32:
                assert (av.view(np.uint32) == bv.view(np.uint32)).all(), (
                    f"grain {g} col {col} not bit-equal"
                )
            else:
                assert (
                    (a[col].isna() & b[col].isna()) | (a[col] == b[col])
                ).all(), f"grain {g} col {col} mismatch"
    tagged.unpersist()
    t1m_c.unpersist()
    cascade[1].unpersist()


def test_fused_dims_equal_per_dimension_rollups(spark):
    """rollup_dims_fused slices must equal rollup_by_dimension exactly."""
    from olympian_spark.operators.rollup import rollup_by_dimension, rollup_dims_fused
    from olympian_spark.plans.pipeline import qc_flags

    df = spark.createDataFrame(gen_transcripts(8_000, 30, seed=13).to_pandas())
    slim = qc_flags(df, QcParams(dip_high=300.0, dip_max=1200.0)).select(
        "conv_id", "ts", "role", "tool", "text_len"
    )
    dims = rollup_dims_fused(slim, ("role", "tool"), "hour").persist()
    for d in ("role", "tool"):
        a = (
            dims.filter(f"dim_kind = '{d}'").drop("dim_kind")
            .withColumnRenamed("dim_value", d)
            .orderBy("bucket_start", d).toPandas()
        )
        b = rollup_by_dimension(slim, d, "hour").orderBy("bucket_start", d).toPandas()
        assert list(a.columns) == list(b.columns)
        assert a.equals(b), f"fused dims != per-dim rollup for {d}"
    dims.unpersist()


def test_int64_key_cascade_matches_string_key(spark):
    """rollup_coarser must honour int64 conv keys (the dictionary-encoded
    path COVERAGE.md advertises): the explicit 1m->1h->1d cascade run with
    int64 keys bit-matches the string-key cascade after key remap. Guards
    the kernels' conv_id output arrays against a hard-coded string type —
    round-2's rollup_coarser regression was exactly that."""
    from olympian_spark.operators.rollup import rollup_1m, rollup_coarser
    from olympian_spark.plans.pipeline import qc_flags

    df = spark.createDataFrame(gen_transcripts(8_000, 24, seed=7).to_pandas())
    flagged = qc_flags(df, PARAMS)
    slim = flagged.select(
        "conv_id", "turn_idx", "ts", "turn_gap_s", "text_len", "flag_dip"
    ).persist()
    # deterministic string -> int64 dictionary encoding
    mapping = slim.select("conv_id").distinct().withColumn(
        "conv_int", F.xxhash64("conv_id")
    ).persist()
    slim_int = (
        slim.join(F.broadcast(mapping), "conv_id")
        .drop("conv_id")
        .withColumnRenamed("conv_int", "conv_id")
    )

    def cascade(src):
        t1m = rollup_1m(src).persist()
        t1h = rollup_coarser(t1m, "hour").persist()
        t1d = rollup_coarser(t1h, "day")
        return t1m, t1h, t1d

    str_tiers = cascade(slim)
    int_tiers = cascade(slim_int)
    for grain, (ts_df, ti_df) in enumerate(zip(str_tiers, int_tiers)):
        assert dict(ti_df.dtypes)["conv_id"] == "bigint", f"grain {grain} key type"
        a = (
            ts_df.join(F.broadcast(mapping), "conv_id")
            .drop("conv_id")
            .withColumnRenamed("conv_int", "conv_id")
            .orderBy("conv_id", "bucket_start")
            .toPandas()
        )
        b = ti_df.orderBy("conv_id", "bucket_start").toPandas()[a.columns]
        assert len(a) == len(b) > 0, f"grain {grain}: rows"
        for col in a.columns:
            av, bv = a[col].to_numpy(), b[col].to_numpy()
            if av.dtype == np.float32:
                assert (av.view(np.uint32) == bv.view(np.uint32)).all(), (
                    f"grain {grain} col {col} not bit-equal"
                )
            else:
                assert (
                    (a[col].isna() & b[col].isna()) | (a[col] == b[col])
                ).all(), f"grain {grain} col {col} mismatch"
    for d in (*str_tiers[:2], *int_tiers[:2], slim, mapping):
        d.unpersist()


def test_skew_split_bounds_groups_and_is_bit_identical(spark):
    """Day-aligned sub-chunking of hot (conv, week) kernel groups (SURVEY §4,
    the 100x-scale straggler/OOM guard): with one conversation holding ~20%
    of all turns inside a single week, a tiny max_chunk_rows must (a) split
    that conversation's week into multiple bounded kernel groups and (b)
    leave every tier output row bit-identical to the unsplit run — all three
    emitted grains nest in a day, so day-aligned splits never cut an output
    bucket."""
    from olympian_spark.operators.rollup import (
        _DAY_US,
        _skew_split_chunk,
        rollup_tiers_fused,
    )
    from olympian_spark.plans.pipeline import qc_flags

    # span_days=5 -> the hot conv's turns land inside one calendar week
    pdf = gen_transcripts(30_000, 40, seed=17, hot_conv_share=0.20, span_days=5.0)
    df = spark.createDataFrame(pdf.to_pandas())
    slim = qc_flags(df, PARAMS).select(
        "conv_id", "turn_idx", "ts", "turn_gap_s", "text_len", "flag_dip"
    )

    # (a) the split itself: hot conv -> several day chunks, each bounded
    ts = F.col("ts").cast("timestamp")
    base = slim.select(
        "conv_id",
        F.unix_micros(F.date_trunc("week", ts)).alias("_chunk"),
        F.unix_micros(ts).alias("_ts_us"),
    )
    split = _skew_split_chunk(base, max_chunk_rows=500)
    per_group = split.groupBy("conv_id", "_chunk").count().collect()
    hot_conv = "conv_000000"  # gen_transcripts makes conv 0 the hot one
    hot_groups = [r for r in per_group if r.conv_id == hot_conv]
    assert len(hot_groups) > 1, "hot conv-week was not split"
    # day-aligned: every split chunk key is a UTC day boundary
    assert all(r._chunk % _DAY_US == 0 for r in hot_groups)
    # bounded by the conv's single-day volume (5 days of data -> each day
    # well under the unsplit 6000-row week)
    assert max(r["count"] for r in hot_groups) < 6000
    # convs below the threshold keep their week chunks untouched
    orig_counts = base.groupBy("conv_id", "_chunk").count().collect()
    cold = {
        r.conv_id
        for r in orig_counts
        if all(c["count"] <= 500 for c in orig_counts if c.conv_id == r.conv_id)
    }
    assert cold, "fixture needs some sub-threshold convs"
    n_cold_split = split.filter(F.col("conv_id").isin(list(cold))).select(
        "conv_id", "_chunk"
    ).distinct().count()
    n_cold_orig = sum(1 for r in orig_counts if r.conv_id in cold)
    assert n_cold_split == n_cold_orig

    # (b) bit-identical tiers
    a = (
        rollup_tiers_fused(slim, max_chunk_rows=500)
        .orderBy("conv_id", "bucket_start", "_grain")
        .toPandas()
    )
    b = (
        rollup_tiers_fused(slim, max_chunk_rows=None)
        .orderBy("conv_id", "bucket_start", "_grain")
        .toPandas()
    )
    assert len(a) == len(b) > 0
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype == np.float32:
            assert (av.view(np.uint32) == bv.view(np.uint32)).all(), (
                f"col {col} not bit-equal under skew split"
            )
        else:
            assert (
                (a[col].isna() & b[col].isna()) | (a[col] == b[col])
            ).all(), f"col {col} mismatch under skew split"


def test_skew_split_pre_epoch_uses_floor_mod_day_keys(spark):
    """Pre-1970 timestamps in a hot chunk must split at FLOOR day
    boundaries (numpy floor-mod, the kernel's rule — see rollup kernel's
    pre-1970 bucket fix): with Spark's sign-of-dividend `%`, a negative
    _ts_us maps to the NEXT day's key unless it sits exactly on midnight,
    so one UTC day's rows would land in two kernel groups and a day-nested
    output bucket would be emitted twice."""
    from olympian_spark.operators.rollup import _DAY_US, _skew_split_chunk

    # one hot (conv, chunk) group spanning pre-epoch days -2 and -1
    start = -(3 * _DAY_US) // 2  # -1.5 days
    rows = [("c0", -2 * _DAY_US, start + i * (_DAY_US // 10)) for i in range(10)]
    base = spark.createDataFrame(rows, "conv_id string, _chunk long, _ts_us long")
    got = _skew_split_chunk(base, max_chunk_rows=5).collect()
    assert len(got) == 10
    for r in got:
        assert r._chunk == r._ts_us - r._ts_us % _DAY_US, (  # Python % IS floor-mod
            f"ts {r._ts_us}: got day key {r._chunk}"
        )
    assert {r._chunk for r in got} == {-2 * _DAY_US, -1 * _DAY_US}


def test_build_tiers_chunk_grain_passthrough_bit_identical(spark):
    """build_tiers(chunk_grain="day") must produce bit-identical tiers to
    the default week chunking (day-nested output buckets never straddle a
    chunk boundary in either grain) — the pipeline-level knob the skew
    guard exposes for chatty-conversation corpora."""
    pdf = gen_transcripts(n_turns=8_000, n_convs=30, seed=9).to_pandas()
    df = spark.createDataFrame(pdf)
    a = build_tiers(df, PARAMS, persist=False)
    b = build_tiers(df, PARAMS, persist=False, chunk_grain="day", max_chunk_rows=500)
    for tier in ("tier_1m", "tier_1h", "tier_1d"):
        pa_ = a[tier].orderBy("conv_id", "bucket_start").toPandas()
        pb_ = b[tier].orderBy("conv_id", "bucket_start").toPandas()
        assert len(pa_) == len(pb_) > 0, tier
        for col in pa_.columns:
            av, bv = pa_[col].to_numpy(), pb_[col].to_numpy()
            if av.dtype == np.float32:
                assert (av.view(np.uint32) == bv.view(np.uint32)).all(), (tier, col)
            else:
                assert (
                    (pa_[col].isna() & pb_[col].isna()) | (pa_[col] == pb_[col])
                ).all(), (tier, col)


def test_tier_plan_exchange_budget(spark):
    """Plan-budget regression pin: a full tier plan (QC windows + fused
    kernel, persist=False so the WHOLE lineage shows) runs on EXACTLY TWO
    Exchanges — the pinned stage-1 window shuffle (REPARTITION_BY_NUM, so
    AQE byte-coalescing cannot starve it) and the kernel's (conv, day)
    repartition (the conversation-skew spreader). A new shuffle sneaking
    into the hot path fails this before it costs a benchmark."""
    from olympian_spark.datagen import gen_transcripts
    from olympian_spark.plans.pipeline import QcParams, build_tiers

    pdf = gen_transcripts(n_turns=4000, n_convs=20, seed=3).to_pandas()
    df = spark.createDataFrame(pdf)
    tiers = build_tiers(
        df, QcParams(dip_high=300.0, dip_max=1200.0), persist=False
    )
    for name in ("tier_1m", "tier_1h", "tier_1d"):
        plan = tiers[name]._jdf.queryExecution().executedPlan().toString()
        # InMemoryRelation prints its cached child plan twice; count each
        # distinct Exchange node once
        n = len({
            line.strip().lstrip("+-: ")
            for line in plan.splitlines()
            if "Exchange " in line
        })
        assert n <= 2, f"{name}: {n} exchanges (budget 2)\n{plan[:1500]}"


def test_build_tiers_fused_bit_identical_to_cascade(spark):
    """build_tiers(fused=True) — the assume_clustered streaming path riding
    the stage-1 window exchange — must be bit-identical to the explicit
    cascade (fused=False), which repartitions independently and never
    relies on input order. Guards the order-dependent contract between
    qc_flags' window layout and the fused kernel."""
    from olympian_spark.datagen import gen_transcripts
    from olympian_spark.plans.pipeline import QcParams, build_tiers

    pdf = gen_transcripts(n_turns=15_000, n_convs=40, seed=23).to_pandas()
    df = spark.createDataFrame(pdf)
    params = QcParams(dip_high=300.0, dip_max=1200.0)
    a = build_tiers(df, params, persist=False, fused=True)
    b = build_tiers(df, params, persist=False, fused=False)
    for tier in ("tier_1m", "tier_1h", "tier_1d"):
        pa_ = a[tier].orderBy("conv_id", "bucket_start").toPandas()
        pb_ = b[tier].orderBy("conv_id", "bucket_start").toPandas()
        assert len(pa_) == len(pb_) > 0, tier
        for col in pa_.columns:
            av, bv = pa_[col].to_numpy(), pb_[col].to_numpy()
            if av.dtype == np.float32:
                assert (av.view(np.uint32) == bv.view(np.uint32)).all(), (tier, col)
            else:
                assert (
                    (pa_[col].isna() & pb_[col].isna()) | (pa_[col] == pb_[col])
                ).all(), (tier, col)
