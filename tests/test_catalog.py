"""Catalog + incremental refresh + retention + resume (Tier E, SURVEY §5):

- overwrite_partitions touches only the partitions present in the new data
- retention delete drops old partitions and records a snapshot
- incremental refresh (new day arrives) == full recompute
- resume: kill after a partial commit, rerun, final tables identical
- manifest carries per-partition lineage + metrics
"""

import os

import pytest
from pyspark.sql import functions as F

from olympian_spark.datagen import gen_transcripts
from olympian_spark.plans.pipeline import QcParams
from olympian_spark.plans.refresh import TIER_TABLES, apply_retention, refresh_tiers
from olympian_spark.sources.catalog import ParquetManifestCatalog

PARAMS = QcParams(dip_high=300.0, dip_max=1200.0)


def _split_by_day(spark, n_turns=12_000, n_convs=40):
    pdf = gen_transcripts(n_turns=n_turns, n_convs=n_convs, seed=42).to_pandas()
    df = spark.createDataFrame(pdf)
    days = sorted(str(r[0]) for r in df.select(F.to_date("ts")).distinct().collect())
    split = days[len(days) // 2]
    first = df.filter(F.to_date("ts") <= split)
    return df, first, split


def _table_state(cat, table):
    return (
        cat.read(table)
        .orderBy("conv_id", "bucket_start")
        .drop("block")
        .toPandas()
        .reset_index(drop=True)
    )


def test_incremental_refresh_equals_full(spark, tmp_path):
    full, first, split = _split_by_day(spark)

    # incremental: commit first half, then the rest arrives
    cat_inc = ParquetManifestCatalog(spark, str(tmp_path / "inc"))
    refresh_tiers(spark, cat_inc, first, watermark="wm1", params=PARAMS)
    refresh_tiers(
        spark, cat_inc, full, watermark="wm2", since_watermark=f"{split} 23:59:59.999999",
        params=PARAMS,
    )

    # oracle: one-shot full refresh
    cat_full = ParquetManifestCatalog(spark, str(tmp_path / "full"))
    refresh_tiers(spark, cat_full, full, watermark="wm2", params=PARAMS)

    for table in TIER_TABLES:
        a = _table_state(cat_inc, table)
        b = _table_state(cat_full, table)
        assert a.equals(b), f"incremental != full for {table}"


def test_incremental_refresh_shuffle_join_path(spark, tmp_path):
    """broadcast_conv_limit=0 forces the scale-safe shuffle semi/anti joins
    (the path taken when a day touches more conv_ids than is broadcastable);
    result must be identical to the broadcast path."""
    full, first, split = _split_by_day(spark, n_turns=6_000, n_convs=20)

    cat_sh = ParquetManifestCatalog(spark, str(tmp_path / "sh"))
    refresh_tiers(spark, cat_sh, first, watermark="wm1", params=PARAMS,
                  broadcast_conv_limit=0)
    refresh_tiers(
        spark, cat_sh, full, watermark="wm2",
        since_watermark=f"{split} 23:59:59.999999", params=PARAMS,
        broadcast_conv_limit=0,
    )

    cat_bc = ParquetManifestCatalog(spark, str(tmp_path / "bc"))
    refresh_tiers(spark, cat_bc, full, watermark="wm2", params=PARAMS)

    for table in TIER_TABLES:
        assert _table_state(cat_sh, table).equals(_table_state(cat_bc, table)), table


def test_resume_after_partial_commit(spark, tmp_path):
    full, first, _ = _split_by_day(spark, n_turns=6_000, n_convs=20)
    cat = ParquetManifestCatalog(spark, str(tmp_path / "resume"))
    refresh_tiers(spark, cat, first, watermark="wm1", params=PARAMS)

    # simulated crash: second run commits only tier_1m, then dies
    class Boom(RuntimeError):
        pass

    orig = ParquetManifestCatalog.overwrite_partitions
    calls = {"n": 0}

    def dying(self, table, df, **kw):
        if calls["n"] >= 1:
            raise Boom()
        calls["n"] += 1
        return orig(self, table, df, **kw)

    ParquetManifestCatalog.overwrite_partitions = dying
    try:
        with pytest.raises(Boom):
            refresh_tiers(spark, cat, full, watermark="wm2", params=PARAMS)
    finally:
        ParquetManifestCatalog.overwrite_partitions = orig

    # resume: rerun the same refresh; already-committed tier_1m is skipped
    results = refresh_tiers(spark, cat, full, watermark="wm2", params=PARAMS)
    assert results["tier_1m"] == "skipped"

    cat2 = ParquetManifestCatalog(spark, str(tmp_path / "oneshot"))
    refresh_tiers(spark, cat2, full, watermark="wm2", params=PARAMS)
    for table in TIER_TABLES:
        assert _table_state(cat, table).equals(_table_state(cat2, table)), table


def test_overwrite_touches_only_new_partitions(spark, tmp_path):
    cat = ParquetManifestCatalog(spark, str(tmp_path / "c"))
    df1 = spark.createDataFrame(
        [("a", "2024-01-01", 1), ("a", "2024-01-02", 2)], "k string, bucket_date string, v int"
    )
    cat.overwrite_partitions("t", df1)
    d1 = os.path.join(str(tmp_path / "c"), "t/data/s1/bucket_date=2024-01-01")
    mtime_before = max(os.path.getmtime(os.path.join(d1, f)) for f in os.listdir(d1))

    df2 = spark.createDataFrame([("a", "2024-01-02", 99)], "k string, bucket_date string, v int")
    cat.overwrite_partitions("t", df2)
    mtime_after = max(os.path.getmtime(os.path.join(d1, f)) for f in os.listdir(d1))
    assert mtime_before == mtime_after  # 01-01 untouched (copy-on-write)
    got = {(str(r.bucket_date), r.v) for r in cat.read("t").collect()}
    assert got == {("2024-01-01", 1), ("2024-01-02", 99)}


def test_time_travel_rollback_and_vacuum(spark, tmp_path):
    """Snapshot semantics of the copy-on-write format: as-of reads
    reconstruct any historical state, rollback restores one by appending
    (history intact), vacuum reclaims only unreachable files."""
    cat = ParquetManifestCatalog(spark, str(tmp_path / "tt"))
    mk = lambda rows: spark.createDataFrame(rows, "k string, bucket_date string, v int")
    s1 = cat.overwrite_partitions("t", mk([("a", "2024-01-01", 1), ("a", "2024-01-02", 2)]))
    s2 = cat.overwrite_partitions("t", mk([("a", "2024-01-02", 99)]))
    cat.delete_where_older("t", "2024-01-02")  # s3: 01-01 expires (metadata-only)

    state = lambda df: {(str(r.bucket_date), r.v) for r in df.collect()}
    assert state(cat.read("t")) == {("2024-01-02", 99)}
    assert state(cat.read("t", as_of=s1["snapshot_id"])) == {
        ("2024-01-01", 1), ("2024-01-02", 2)}
    assert state(cat.read("t", as_of=s2["snapshot_id"])) == {
        ("2024-01-01", 1), ("2024-01-02", 99)}

    # rollback to s1 appends a record; reads now see s1's state, and the
    # rolled-over snapshots remain time-travel-readable
    cat.rollback("t", s1["snapshot_id"])
    assert state(cat.read("t")) == {("2024-01-01", 1), ("2024-01-02", 2)}
    assert state(cat.read("t", as_of=s2["snapshot_id"])) == {
        ("2024-01-01", 1), ("2024-01-02", 99)}

    # vacuum with no history retention: s2's 01-02 files (unreferenced by
    # the current, post-rollback state) are reclaimed; current state intact
    cat.expire_snapshots("t", keep_last=0)
    assert not os.path.isdir(os.path.join(str(tmp_path / "tt"), "t/data/s2"))
    assert state(cat.read("t")) == {("2024-01-01", 1), ("2024-01-02", 2)}
    with pytest.raises(Exception):
        cat.read("t", as_of=s2["snapshot_id"]).collect()


def test_compaction_rewrites_fragmented_partitions(spark, tmp_path):
    """A commit whose writer fanned out over many tasks leaves many small
    files per partition; compact_partitions rewrites them into few files
    as a new snapshot with identical content, leaving history readable."""
    cat = ParquetManifestCatalog(spark, str(tmp_path / "cp"))
    rows = [("k%d" % i, "2024-01-01", i) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, bucket_date string, v int").repartition(8)
    # distribute=False simulates a writer that pre-shaped its own layout
    # (the default hash distribution would land each partition as ONE file,
    # leaving nothing to compact — that behavior is pinned further down)
    s1 = cat.overwrite_partitions("t", df, distribute=False)

    pdir = os.path.join(str(tmp_path / "cp"), "t/data/s1/bucket_date=2024-01-01")
    n_before = sum(1 for f in os.listdir(pdir) if f.endswith(".parquet"))
    assert n_before >= 2  # fragmented

    snap = cat.compact_partitions("t")
    assert snap is not None and snap["op"] == "compact"
    live = cat.committed_partitions("t")
    cdir = os.path.join(
        str(tmp_path / "cp"),
        f"t/data/s{live['2024-01-01']['snapshot_id']}/bucket_date=2024-01-01",
    )
    n_after = sum(1 for f in os.listdir(cdir) if f.endswith(".parquet"))
    assert n_after < n_before and n_after == 1

    state = lambda df_: sorted((r.k, str(r.bucket_date), r.v) for r in df_.collect())
    assert state(cat.read("t")) == sorted((k, d, v) for k, d, v in rows)
    assert state(cat.read("t", as_of=s1["snapshot_id"])) == state(cat.read("t"))
    # already compact -> no-op
    assert cat.compact_partitions("t") is None


def test_schema_evolution_and_sorted_compaction(spark, tmp_path):
    """Add-column evolution: partitions written before a column existed
    null-fill it on read (Iceberg semantics). Sorted compaction clusters
    rows so parquet row-group stats support pruning."""
    import pyarrow.parquet as pq

    cat = ParquetManifestCatalog(spark, str(tmp_path / "se"))
    cat.overwrite_partitions(
        "t",
        spark.createDataFrame([("a", "2024-01-01", 1)], "k string, bucket_date string, v int"),
    )
    cat.overwrite_partitions(
        "t",
        spark.createDataFrame(
            [("b", "2024-01-02", 2, 9.5)],
            "k string, bucket_date string, v int, score double",
        ),
    )
    got = {(r.k, r.v, r.score) for r in cat.read("t").collect()}
    assert got == {("a", 1, None), ("b", 2, 9.5)}

    # sorted compaction: fragment one partition, compact with sort_by=v desc?
    # (sortWithinPartitions ascending by default) -> file rows ordered by v
    rows = [("k%03d" % i, "2024-01-03", 999 - i) for i in range(300)]
    cat.overwrite_partitions(
        "t",
        spark.createDataFrame(rows, "k string, bucket_date string, v int").repartition(6),
        distribute=False,
    )
    snap = cat.compact_partitions("t", sort_by=["v"])
    assert snap is not None
    live = cat.committed_partitions("t")
    cdir = os.path.join(
        str(tmp_path / "se"),
        f"t/data/s{live['2024-01-03']['snapshot_id']}/bucket_date=2024-01-03",
    )
    fs = [f for f in os.listdir(cdir) if f.endswith(".parquet")]
    assert len(fs) == 1
    vals = pq.read_table(os.path.join(cdir, fs[0]), columns=["v"])["v"].to_pylist()
    assert vals == sorted(vals)  # clustered -> row-group min/max usable


def test_checkpoint_manifest_squashes_history(spark, tmp_path):
    """Manifest checkpoint: history folds into one base snapshot with the
    live partition map, preserving input watermark + retention cutoffs;
    reads identical; unreferenced files vacuumed; later commits work."""
    cat = ParquetManifestCatalog(spark, str(tmp_path / "cm"))
    mk = lambda rows: spark.createDataFrame(rows, "k string, bucket_date string, v int")
    for epoch in range(5):  # streaming-style history
        cat.overwrite_partitions(
            "t", mk([("a", "2024-01-%02d" % (epoch + 1), epoch)]),
            input_watermark=f"epoch={epoch}",
        )
    cat.delete_where_older("t", "2024-01-02")
    before = {(str(r.bucket_date), r.v) for r in cat.read("t").collect()}

    snap = cat.checkpoint_manifest("t")
    assert snap["op"] == "base"
    m = cat._load_manifest("t")
    assert len(m["snapshots"]) == 1
    assert {(str(r.bucket_date), r.v) for r in cat.read("t").collect()} == before
    assert cat.input_watermark("t") == "epoch=4"
    assert cat.retention_cutoff("t") == "2024-01-02"
    # expired day's files were vacuumed
    assert not os.path.isdir(os.path.join(str(tmp_path / "cm"), "t/data/s1"))

    # post-checkpoint commit + read still correct, ids stay monotonic
    s_next = cat.overwrite_partitions("t", mk([("a", "2024-01-06", 99)]))
    assert s_next["snapshot_id"] > snap["snapshot_id"]
    got = {(str(r.bucket_date), r.v) for r in cat.read("t").collect()}
    assert got == before | {("2024-01-06", 99)}
    # and a second checkpoint after retention keeps the newer cutoff
    cat.delete_where_older("t", "2024-01-03")
    cat.checkpoint_manifest("t")
    assert cat.retention_cutoff("t") == "2024-01-03"


def test_vacuum_reclaims_orphans_keeps_history(spark, tmp_path):
    cat = ParquetManifestCatalog(spark, str(tmp_path / "vo"))
    mk = lambda rows: spark.createDataFrame(rows, "k string, bucket_date string, v int")
    s1 = cat.overwrite_partitions("t", mk([("a", "2024-01-01", 1)]))
    s2 = cat.overwrite_partitions("t", mk([("a", "2024-01-01", 2)]))
    # orphan of a crashed commit: data written, manifest never swapped
    orphan = os.path.join(str(tmp_path / "vo"), "t/data/s99/bucket_date=2024-01-01")
    os.makedirs(orphan)
    open(os.path.join(orphan, "part-0.parquet"), "wb").close()

    cat.expire_snapshots("t", keep_last=2)
    assert not os.path.isdir(os.path.dirname(orphan))
    state = lambda df: {(str(r.bucket_date), r.v) for r in df.collect()}
    assert state(cat.read("t", as_of=s1["snapshot_id"])) == {("2024-01-01", 1)}
    assert state(cat.read("t", as_of=s2["snapshot_id"])) == {("2024-01-01", 2)}


def test_retention_and_manifest(spark, tmp_path):
    cat = ParquetManifestCatalog(spark, str(tmp_path / "r"))
    rows = [("a", f"2024-01-{d:02d}", d) for d in range(1, 11)]
    cat.overwrite_partitions("t", spark.createDataFrame(rows, "k string, bucket_date string, v int"),
                             input_watermark="wm1")
    apply_retention(cat, {"t": "2024-01-05"})
    left = sorted(str(r.bucket_date) for r in cat.read("t").collect())
    assert left == [f"2024-01-{d:02d}" for d in range(5, 11)]
    live = cat.committed_partitions("t")
    assert set(live) == set(left)
    m = cat.manifest_df("t").toPandas()
    assert (m[m.op == "overwrite_partitions"].rows > 0).all()
    assert cat.input_watermark("t") == "wm1"
    snap = cat.current_snapshot("t")
    assert snap["op"] == "retention_delete" and snap["cutoff"] == "2024-01-05"


def test_refresh_after_retention_does_not_resurrect(spark, tmp_path):
    """Expiry wins over refresh: after apply_retention, an incremental
    refresh (which recomputes from FULL turn history of affected
    conversations — including boundary-day merges that reach back before
    the cutoff) must not re-create expired partitions."""
    full, first, split = _split_by_day(spark)
    cat = ParquetManifestCatalog(spark, str(tmp_path / "rr"))
    refresh_tiers(spark, cat, first, watermark="wm1", params=PARAMS)

    days = sorted(str(r[0]) for r in full.select(F.to_date("ts")).distinct().collect())
    cutoff = days[1]  # expire the first day on every tier
    apply_retention(cat, {t: cutoff for t in TIER_TABLES})
    for t in TIER_TABLES:
        assert cat.retention_cutoff(t) == cutoff
        live = set(cat.committed_partitions(t))
        assert all(d >= cutoff for d in live), f"{t}: expired day survived retention"

    # second half arrives; conversations spanning the cutoff force
    # boundary-day recomputation that reaches into the expired day
    refresh_tiers(
        spark, cat, full, watermark="wm2",
        since_watermark=f"{split} 23:59:59.999999", params=PARAMS,
    )
    for t in TIER_TABLES:
        live = set(cat.committed_partitions(t))
        assert all(d >= cutoff for d in live), f"{t}: refresh resurrected expired day"
        stored = {str(r[0]) for r in cat.read(t).select("bucket_date").distinct().collect()}
        assert all(d >= cutoff for d in stored), f"{t}: expired rows on disk"
    # and the post-cutoff data is all there: matches a full recompute >= cutoff
    cat_full = ParquetManifestCatalog(spark, str(tmp_path / "rr_full"))
    refresh_tiers(spark, cat_full, full, watermark="wm2", params=PARAMS)
    for t in TIER_TABLES:
        a = _table_state(cat, t)
        b = _table_state(cat_full, t)
        b = b[b.bucket_date.astype(str) >= cutoff].reset_index(drop=True)
        assert a.equals(b), f"{t}: post-cutoff content diverged from full recompute"


def test_default_distribution_one_file_per_partition(spark, tmp_path):
    """The default hash distribution writes exactly one file per partition
    value regardless of upstream task fan-out — the guard against the
    tasks x days small-file explosion (measured 14k files for 8k day
    partitions before the fix)."""
    cat = ParquetManifestCatalog(spark, str(tmp_path / "cd"))
    rows = [
        ("k%03d" % i, "2024-01-%02d" % (1 + i % 9), i) for i in range(270)
    ]
    df = spark.createDataFrame(
        rows, "k string, bucket_date string, v int"
    ).repartition(16)  # heavy fan-out upstream
    cat.overwrite_partitions("t", df)
    base = os.path.join(str(tmp_path / "cd"), "t/data/s1")
    for d in sorted(os.listdir(base)):
        if not d.startswith("bucket_date="):
            continue
        n = sum(1 for f in os.listdir(os.path.join(base, d)) if f.endswith(".parquet"))
        assert n == 1, f"{d}: {n} files"
    # content survives the redistribution
    assert cat.read("t").count() == 270


def test_catalog_supports_coarser_partition_columns(spark, tmp_path):
    """Sparse multi-decade histories want coarser partitions than a day —
    the catalog's partition_col is per-commit, so a month-partitioned tier
    table gets the same overwrite/retention semantics (the knob
    BENCH/BASELINE.md R4.4 points to)."""
    cat = ParquetManifestCatalog(spark, str(tmp_path / "cm"))
    df = spark.createDataFrame(
        [
            ("a", "2024-01-15", 1),
            ("b", "2024-02-03", 2),
            ("c", "2024-03-20", 3),
        ],
        "k string, d string, v int",
    ).withColumn(
        "bucket_month",
        F.date_format(F.date_trunc("month", F.col("d").cast("date")), "yyyy-MM"),
    )
    cat.overwrite_partitions("t", df, partition_col="bucket_month")
    assert cat.read("t").count() == 3
    # partition-isolated second commit
    df2 = df.filter("k = 'b'").withColumn("v", F.lit(99))
    cat.overwrite_partitions("t", df2, partition_col="bucket_month")
    got = {(r.k, r.v) for r in cat.read("t").collect()}
    assert got == {("a", 1), ("b", 99), ("c", 3)}
    # metadata-only retention on the month column
    cat.delete_where_older("t", "2024-02", partition_col="bucket_month")
    got = {r.k for r in cat.read("t").collect()}
    assert got == {"b", "c"}


def test_diff_snapshots_metadata_pruned(spark, tmp_path):
    """CDC between snapshots: changed_partitions is metadata-only and
    diff_snapshots reads ONLY differing partitions (pruned read set),
    returning the exact added/removed row sets."""
    cat = ParquetManifestCatalog(spark, str(tmp_path / "diff"))
    mk = lambda rows: spark.createDataFrame(rows, "k string, bucket_date string, v int")
    s1 = cat.overwrite_partitions("t", mk(
        [("a", "2024-01-01", 1), ("b", "2024-01-01", 2), ("a", "2024-01-02", 3)]
    ))
    s2 = cat.overwrite_partitions("t", mk([("a", "2024-01-02", 99), ("c", "2024-01-03", 4)]))

    # metadata-only: 01-01 unchanged between s1 and s2
    assert cat.changed_partitions("t", s1["snapshot_id"], s2["snapshot_id"]) == {
        "2024-01-02", "2024-01-03",
    }
    got = {
        (r.k, str(r.bucket_date), r.v, r.change)
        for r in cat.diff_snapshots("t", s1["snapshot_id"], s2["snapshot_id"]).collect()
    }
    assert got == {
        ("a", "2024-01-02", 99, "added"),
        ("c", "2024-01-03", 4, "added"),
        ("a", "2024-01-02", 3, "removed"),
    }
    # key-restricted diff: same keyspace, no value column
    got_k = {
        (r.k, str(r.bucket_date), r.change)
        for r in cat.diff_snapshots(
            "t", s1["snapshot_id"], s2["snapshot_id"], key_cols=["k", "bucket_date"]
        ).collect()
    }
    assert got_k == {("c", "2024-01-03", "added")}
    # diff against head (None) == diff against the latest snapshot id
    got_head = {
        (r.k, str(r.bucket_date), r.v, r.change)
        for r in cat.diff_snapshots("t", s1["snapshot_id"]).collect()
    }
    assert got_head == got
    # identical snapshots -> explicit error, not an empty scan
    with pytest.raises(ValueError):
        cat.diff_snapshots("t", s2["snapshot_id"], s2["snapshot_id"])


def test_compact_zorder_bounded_boxes(spark, tmp_path):
    """Z-ordered compaction: every output file's (x, y) min/max box is
    bounded in BOTH dimensions, where a lexicographic x-sort would give
    each file the full y span."""
    import glob
    import os as _os

    cat = ParquetManifestCatalog(spark, str(tmp_path / "zo"))
    n = 128
    # hash-scrambled row order: the incoming layout is uncorrelated with
    # (x, y), as post-shuffle data would be
    grid = (
        spark.range(n * n)
        .selectExpr(
            "CAST(id % 128 AS DOUBLE) AS x",
            "CAST(CAST(id / 128 AS INT) AS DOUBLE) AS y",
            "'2024-01-01' AS bucket_date",
            "xxhash64(id) AS scramble",
        )
        .repartition(8, "scramble")
        .drop("scramble")
    )
    cat.overwrite_partitions("t", grid, distribute=False)  # 8 unclustered files
    snap = cat.compact_partitions(
        "t", target_file_bytes=8_000, zorder_by=["x", "y"]
    )
    assert snap is not None and snap["op"] == "compact"
    pdir = _os.path.join(
        str(tmp_path / "zo"), "t", "data", f"s{snap['snapshot_id']}",
        "bucket_date=2024-01-01",
    )
    files = glob.glob(_os.path.join(pdir, "*.parquet"))
    assert len(files) >= 4
    spans = []
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
            .collect()[0]
        )
        spans.append((r[1] - r[0], r[3] - r[2]))
    # Morton slabs: no file spans (nearly) the full range in BOTH dims,
    # and at least half the files are bounded in EACH dim
    assert all(min(sx, sy) <= 80 for sx, sy in spans), spans
    bounded = sum(1 for sx, sy in spans if sx <= 80 and sy <= 80)
    assert bounded >= len(spans) // 2, spans
    # content unchanged by the rewrite
    assert cat.read("t").count() == n * n
    with pytest.raises(ValueError):
        cat.compact_partitions("t", sort_by=["x"], zorder_by=["x"])


def test_incremental_exact_dedup_cdc(spark, tmp_path):
    """Daily incremental dedup: only docs added since the last snapshot are
    considered, content already present before is dropped, and the union
    with the prior keepers equals the full-recompute keepers."""
    from olympian_spark.operators.dedup import exact_dedup, incremental_exact_dedup

    cat = ParquetManifestCatalog(spark, str(tmp_path / "incdd"))
    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, bucket_date STRING"
    )
    day1 = mk([
        (0, "alpha text", "2024-01-01"),
        (1, "beta text", "2024-01-01"),
        (2, "alpha text", "2024-01-01"),   # in-day dup of 0
    ])
    s1 = cat.overwrite_partitions("docs", day1)
    day2 = mk([
        (10, "gamma text", "2024-01-02"),  # new content
        (11, "alpha text", "2024-01-02"),  # dups day1 content
        (12, "gamma text", "2024-01-02"),  # in-day dup of 10
        (13, "delta text", "2024-01-02"),  # new content
    ])
    cat.overwrite_partitions("docs", day1.unionByName(day2).filter("bucket_date = '2024-01-02'"))

    inc = incremental_exact_dedup(cat, "docs", s1["snapshot_id"])
    got = {(r["keep_doc_id"], r["n_docs"]) for r in inc.collect()}
    assert got == {(10, 2), (13, 1)}  # gamma kept at 10 (11 dropped: old content)

    # consistency: incremental keepers + prior keepers == full recompute
    full = {r["keep_doc_id"] for r in exact_dedup(cat.read("docs")).collect()}
    prior = {
        r["keep_doc_id"]
        for r in exact_dedup(cat.read("docs", as_of=s1["snapshot_id"])).collect()
    }
    assert prior | {k for k, _ in got} == full

    # maintained-index path gives the same answer
    from olympian_spark.operators.textstats import with_fingerprint
    idx = (
        with_fingerprint(cat.read("docs", as_of=s1["snapshot_id"]))
        .select("fingerprint").distinct()
    )
    got_idx = {
        (r["keep_doc_id"], r["n_docs"])
        for r in incremental_exact_dedup(
            cat, "docs", s1["snapshot_id"], old_fingerprints=idx
        ).collect()
    }
    assert got_idx == got

    # a no-op day (nothing changed since head) returns ZERO rows, not a
    # crash — the daily incremental job must survive quiet days
    head = cat.current_snapshot("docs")["snapshot_id"]
    quiet = incremental_exact_dedup(cat, "docs", head)
    assert quiet.count() == 0
    assert quiet.columns == ["fingerprint", "keep_doc_id", "n_docs"]


def test_diff_snapshots_across_rollback(spark, tmp_path):
    """CDC folds rollback records: diffing from a pre-rollback snapshot to
    head (post-rollback) reports exactly the overwrite being undone."""
    cat = ParquetManifestCatalog(spark, str(tmp_path / "rbdiff"))
    mk = lambda rows: spark.createDataFrame(rows, "k string, bucket_date string, v int")
    s1 = cat.overwrite_partitions("t", mk([("a", "2024-01-01", 1), ("b", "2024-01-02", 2)]))
    s2 = cat.overwrite_partitions("t", mk([("a", "2024-01-02", 99)]))
    cat.rollback("t", s1["snapshot_id"])
    # head state == s1 state, so diff s2 -> head undoes s2's overwrite
    got = {
        (r.k, str(r.bucket_date), r.v, r.change)
        for r in cat.diff_snapshots("t", s2["snapshot_id"]).collect()
    }
    assert got == {
        ("a", "2024-01-02", 99, "removed"),
        ("b", "2024-01-02", 2, "added"),
    }
    # and s1 -> head is empty (identical states) -> explicit error
    with pytest.raises(ValueError):
        cat.diff_snapshots("t", s1["snapshot_id"])


def test_manifest_column_stats_pruned_read(spark, tmp_path):
    """stats_cols at commit time record per-partition [min, max] bounds
    from parquet footers (metadata only); read_where_between scans ONLY
    overlapping partitions and still row-filters exactly."""
    cat = ParquetManifestCatalog(spark, str(tmp_path / "stats"))
    mk = lambda rows: spark.createDataFrame(rows, "k string, bucket_date string, v bigint")
    rows = []
    for day, base in (("2024-01-01", 0), ("2024-01-02", 1000), ("2024-01-03", 2000)):
        rows += [(f"k{j}", day, base + j) for j in range(100)]
    cat.overwrite_partitions("t", mk(rows), stats_cols=["v"])

    live = cat.committed_partitions("t")
    assert live["2024-01-01"]["stats"]["v"] == [0, 99]
    assert live["2024-01-03"]["stats"]["v"] == [2000, 2099]

    # metadata-only pruning: the middle partition alone overlaps
    assert set(cat.pruned_partitions("t", "v", 1050, 1060)) == {"2024-01-02"}
    got = cat.read_where_between("t", "v", 1050, 1060)
    assert sorted(r.v for r in got.collect()) == list(range(1050, 1061))
    # range spanning two partitions
    assert set(cat.pruned_partitions("t", "v", 90, 1010)) == {
        "2024-01-01", "2024-01-02",
    }
    assert cat.read_where_between("t", "v", 90, 1010).count() == 10 + 11
    # disjoint range -> empty frame, zero partitions scanned
    assert set(cat.pruned_partitions("t", "v", 5000, 6000)) == set()
    assert cat.read_where_between("t", "v", 5000, 6000).count() == 0
    # commits without stats_cols stay conservatively unpruned
    cat2 = ParquetManifestCatalog(spark, str(tmp_path / "nostats"))
    cat2.overwrite_partitions("t", mk(rows))
    assert len(cat2.pruned_partitions("t", "v", 5000, 6000)) == 3


def test_refresh_commits_bucket_start_bounds(spark, tmp_path):
    """Tier refresh records bucket_start bounds in the manifest, and a
    time-range read prunes to the overlapping day partitions only."""
    full, first, split = _split_by_day(spark)
    cat = ParquetManifestCatalog(spark, str(tmp_path / "tstats"))
    refresh_tiers(spark, cat, full, watermark="wm", params=PARAMS)
    live = cat.committed_partitions("tier_1h")
    assert live and all(
        "bucket_start" in (rec.get("stats") or {}) for rec in live.values()
    )
    some_day = sorted(live)[1]
    lo, hi = f"{some_day}T06:00:00", f"{some_day}T07:00:00"
    assert set(cat.pruned_partitions("tier_1h", "bucket_start", lo, hi)) == {some_day}


def test_verify_table_detects_tamper(spark, tmp_path):
    """verify_table is clean on a healthy table, flags deleted partition
    dirs and row-count drift, and stays clean across time-travel ops."""
    import glob
    import os as _os
    import shutil

    cat = ParquetManifestCatalog(spark, str(tmp_path / "vt"))
    mk = lambda rows: spark.createDataFrame(rows, "k string, bucket_date string, v int")
    cat.overwrite_partitions("t", mk(
        [("a", "2024-01-01", 1), ("b", "2024-01-02", 2), ("c", "2024-01-03", 3)]
    ))
    rep = cat.verify_table("t")
    assert rep["ok"] and rep["partitions"] == 3 and rep["issues"] == []

    # retention + new commit keep the audit clean
    cat.delete_where_older("t", "2024-01-02")
    cat.overwrite_partitions("t", mk([("d", "2024-01-04", 4)]))
    assert cat.verify_table("t")["ok"]

    # tamper: remove one live partition's files
    live = cat.committed_partitions("t")
    rec = live["2024-01-02"]
    pdir = _os.path.join(cat._snap_dir("t", rec["snapshot_id"]), "bucket_date=2024-01-02")
    for f in glob.glob(_os.path.join(pdir, "*.parquet")):
        _os.remove(f)
    rep2 = cat.verify_table("t")
    assert not rep2["ok"]
    assert any("2024-01-02" in i for i in rep2["issues"])
    shutil.rmtree(pdir)
    rep3 = cat.verify_table("t")
    assert any("missing directory" in i for i in rep3["issues"])


def test_snapshot_tags_pin_and_survive_vacuum(spark, tmp_path):
    """Tags: named refs resolve across later commits, re-tagging moves the
    ref, and a tagged state's files survive expire_snapshots(keep_last=0)
    while untagged history is vacuumed."""
    cat = ParquetManifestCatalog(spark, str(tmp_path / "tags"))
    mk = lambda rows: spark.createDataFrame(rows, "k string, bucket_date string, v int")
    s1 = cat.overwrite_partitions("t", mk([("a", "2024-01-01", 1)]))
    cat.tag_snapshot("t", "v1.0")
    s2 = cat.overwrite_partitions("t", mk([("a", "2024-01-01", 2)]))
    s3 = cat.overwrite_partitions("t", mk([("a", "2024-01-01", 3)]))

    assert cat.resolve_tag("t", "v1.0") == s1["snapshot_id"]
    assert [r.v for r in cat.read_tag("t", "v1.0").collect()] == [1]
    # re-tag moves the ref
    cat.tag_snapshot("t", "v1.0", snapshot_id=s2["snapshot_id"])
    assert [r.v for r in cat.read_tag("t", "v1.0").collect()] == [2]
    cat.tag_snapshot("t", "release", snapshot_id=s1["snapshot_id"])

    # vacuum: everything unreferenced goes; tagged s1/s2 states survive
    cat.expire_snapshots("t", keep_last=0)
    assert [r.v for r in cat.read_tag("t", "release").collect()] == [1]
    assert [r.v for r in cat.read_tag("t", "v1.0").collect()] == [2]
    assert [r.v for r in cat.read("t").collect()] == [3]
    assert cat.verify_table("t")["ok"]
    with pytest.raises(ValueError):
        cat.resolve_tag("t", "nope")
    with pytest.raises(ValueError):
        cat.tag_snapshot("t", "bad", snapshot_id=99999)


def test_optimize_table_one_call(spark, tmp_path):
    """optimize_table: compaction + vacuum in one call; table readable and
    audit-clean after; repeated calls are no-ops on a healthy table."""
    cat = ParquetManifestCatalog(spark, str(tmp_path / "opt"))
    grid = spark.range(2000).selectExpr(
        "CAST(id AS DOUBLE) AS x", "'2024-01-01' AS bucket_date",
        "xxhash64(id) AS scramble",
    ).repartition(8, "scramble").drop("scramble")
    cat.overwrite_partitions("t", grid, distribute=False)  # 8 small files
    cat.overwrite_partitions("t", grid, distribute=False)  # + an old state
    rep = cat.optimize_table("t", target_file_bytes=8_000, keep_last=0)
    assert rep["compacted"]
    assert rep["removed_dirs"] >= 1  # the superseded snapshot was vacuumed
    assert cat.read("t").count() == 2000
    assert cat.verify_table("t")["ok"]
    rep2 = cat.optimize_table("t", target_file_bytes=8_000, keep_last=0)
    assert not rep2["compacted"]  # already compacted: no rewrite


def test_tags_survive_checkpoint_manifest_and_later_vacuum(spark, tmp_path):
    """Manifest checkpoint must carry live tags through the squash: the tag
    still resolves, its state still reads, its files survive BOTH the
    checkpoint's own vacuum and a LATER expire_snapshots(keep_last=0), and
    partitions live only in the tagged state never leak into the current
    state (base records replace, not merge)."""
    cat = ParquetManifestCatalog(spark, str(tmp_path / "ckpt_tags"))
    mk = lambda rows: spark.createDataFrame(rows, "k string, bucket_date string, v int")
    s1 = cat.overwrite_partitions(
        "t", mk([("a", "2024-01-01", 1), ("b", "2024-01-02", 10)])
    )
    cat.tag_snapshot("t", "v1.0")
    cat.delete_where_older("t", cutoff="2024-01-02")  # drop 01-01 from live
    cat.overwrite_partitions("t", mk([("a", "2024-01-02", 2)]))
    cat.overwrite_partitions("t", mk([("a", "2024-01-02", 3)]))

    cat.checkpoint_manifest("t")
    # tag still resolves + reads the pinned state
    assert cat.resolve_tag("t", "v1.0") == s1["snapshot_id"]
    assert sorted(r.v for r in cat.read_tag("t", "v1.0").collect()) == [1, 10]
    # the expired partition lives ONLY in the tag, not the current state
    assert sorted(r.v for r in cat.read("t").collect()) == [3]
    # a later vacuum must still treat the tagged state as reachable
    cat.expire_snapshots("t", keep_last=0)
    assert sorted(r.v for r in cat.read_tag("t", "v1.0").collect()) == [1, 10]
    assert sorted(r.v for r in cat.read("t").collect()) == [3]
    # optimize_table's checkpoint-over path must not break tags either
    cat.overwrite_partitions("t", mk([("a", "2024-01-02", 4)]))
    cat.optimize_table("t", checkpoint_over=1, keep_last=0)
    assert sorted(r.v for r in cat.read_tag("t", "v1.0").collect()) == [1, 10]
