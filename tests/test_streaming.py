"""Structured Streaming: file-source micro-batches vs the batch answers."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from olympian_spark.datagen import gen_transcripts
from olympian_spark.streaming.rollup_stream import (
    read_transcripts_stream,
    streaming_rollup_1m,
    streaming_turn_gaps,
)


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    """Two micro-batch files split mid-conversation (forces cross-batch
    state for the gap operator)."""
    d = tmp_path_factory.mktemp("stream")
    table = gen_transcripts(n_turns=4_000, n_convs=20, seed=9)
    df = table.to_pandas().sort_values(["ts"]).reset_index(drop=True)
    half = len(df) // 2
    for i, part in enumerate((df.iloc[:half], df.iloc[half:])):
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(str(d), f"batch{i}.parquet"))
    return str(d)


def test_streaming_rollup_counts_match_batch(spark, stream_dir, tmp_path):
    stream = read_transcripts_stream(spark, stream_dir)
    agg = streaming_rollup_1m(stream, watermark="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("s1m")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM s1m").toPandas()

    batch = (
        spark.read.parquet(stream_dir)
        .groupBy(F.date_trunc("minute", "ts").alias("bucket_start"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"),
             F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("sum_text_len"))
        .toPandas()
    )
    # append mode emits only buckets older than the final watermark; every
    # emitted bucket must match the batch answer exactly
    merged = got.merge(batch, on=["conv_id", "bucket_start"], suffixes=("_s", "_b"))
    assert len(merged) == len(got) and len(got) > 0
    assert (merged.n_turns_s == merged.n_turns_b).all()
    assert (merged.sum_text_len_s == merged.sum_text_len_b).all()


def test_streaming_turn_gaps_match_batch_lag(spark, stream_dir, tmp_path):
    stream = read_transcripts_stream(spark, stream_dir)
    gaps = streaming_turn_gaps(stream)
    q = (
        gaps.writeStream.format("memory")
        .queryName("sgaps")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sgaps").toPandas()

    from olympian_spark.sources.transcripts import with_turn_metrics

    batch = (
        with_turn_metrics(spark.read.parquet(stream_dir))
        .select("conv_id", "turn_idx", "turn_gap_s")
        .toPandas()
    )
    merged = batch.merge(got, on=["conv_id", "turn_idx"], suffixes=("_b", "_s"))
    assert len(merged) == len(batch) == len(got)
    import numpy as np

    a = merged.turn_gap_s_b.to_numpy(np.float32)
    b = merged.turn_gap_s_s.to_numpy(np.float32)
    both_nan = np.isnan(a) & np.isnan(b)
    assert (both_nan | (a.view(np.uint32) == b.view(np.uint32))).all()


def test_stream_rollup_to_catalog_sink(spark, stream_dir, tmp_path):
    """Two availableNow passes (second re-processes nothing new but
    exercises restart-from-checkpoint) must land exactly the batch answer
    in the catalog, with manifest snapshots recorded per commit."""
    from olympian_spark.sources.catalog import ParquetManifestCatalog
    from olympian_spark.streaming.rollup_stream import stream_rollup_to_catalog

    cat = ParquetManifestCatalog(spark, str(tmp_path / "cat"))
    stream = read_transcripts_stream(spark, stream_dir)
    agg = streaming_rollup_1m(stream, watermark="0 seconds")
    writer = stream_rollup_to_catalog(agg, cat, "stream_1m", str(tmp_path / "ck"))
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    # restart: checkpoint says everything is processed; no-op commit
    q2 = stream_rollup_to_catalog(agg, cat, "stream_1m", str(tmp_path / "ck")) \
        .trigger(availableNow=True).start()
    q2.awaitTermination(120)

    got = cat.read("stream_1m").drop("bucket_date").toPandas()
    batch = (
        spark.read.parquet(stream_dir)
        .groupBy(F.date_trunc("minute", "ts").alias("bucket_start"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"),
             F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("sum_text_len"))
        .toPandas()
    )
    merged = got.merge(batch, on=["conv_id", "bucket_start"], suffixes=("_s", "_b"))
    # watermark-finalized buckets only; each must match batch exactly, no dupes
    assert len(merged) == len(got) > 0
    assert not got.duplicated(["conv_id", "bucket_start"]).any()
    assert (merged.n_turns_s == merged.n_turns_b).all()
    assert (merged.sum_text_len_s == merged.sum_text_len_b).all()
    # manifest recorded the streaming commits with epoch watermarks
    snaps = cat._load_manifest("stream_1m")["snapshots"]
    assert snaps and all(s["input_watermark"].startswith("epoch=") for s in snaps)


def test_stream_sink_with_maintenance_ride_along(spark, stream_dir, tmp_path):
    """compact_every wires table maintenance into the commit path: results
    must be identical to the plain sink, and any compact/vacuum snapshots
    must leave reads exact. (Whether compaction actually fires depends on
    write fragmentation — the catalog-level behavior is pinned by
    test_catalog::test_compaction_rewrites_fragmented_partitions.)"""
    from olympian_spark.sources.catalog import ParquetManifestCatalog
    from olympian_spark.streaming.rollup_stream import stream_rollup_to_catalog

    cat = ParquetManifestCatalog(spark, str(tmp_path / "catm"))
    stream = read_transcripts_stream(spark, stream_dir)
    agg = streaming_rollup_1m(stream, watermark="0 seconds")
    writer = stream_rollup_to_catalog(
        agg, cat, "m_1m", str(tmp_path / "ckm"), compact_every=1,
        vacuum_keep_last=1,
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = cat.read("m_1m").drop("bucket_date").toPandas()
    batch = (
        spark.read.parquet(stream_dir)
        .groupBy(F.date_trunc("minute", "ts").alias("bucket_start"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"),
             F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("sum_text_len"))
        .toPandas()
    )
    merged = got.merge(batch, on=["conv_id", "bucket_start"], suffixes=("_s", "_b"))
    assert len(merged) == len(got) > 0
    assert not got.duplicated(["conv_id", "bucket_start"]).any()
    assert (merged.n_turns_s == merged.n_turns_b).all()
    ops = {s["op"] for s in cat._load_manifest("m_1m")["snapshots"]}
    assert "overwrite_partitions" in ops  # maintenance ops optional extras


def test_streaming_turn_gaps_tiny_arrow_chunks(spark, stream_dir, tmp_path):
    """One key's micro-batch rows split across MANY Arrow chunks (forced
    with maxRecordsPerBatch=2) must still produce the batch lag answer:
    _gap_fn concatenates and sorts the whole key before diffing instead of
    carrying state chunk-to-chunk in iterator order."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = read_transcripts_stream(spark, stream_dir)
        gaps = streaming_turn_gaps(stream)
        q = (
            gaps.writeStream.format("memory")
            .queryName("sgaps_tiny")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck_tiny"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = spark.sql("SELECT * FROM sgaps_tiny").toPandas()

    from olympian_spark.sources.transcripts import with_turn_metrics

    batch = (
        with_turn_metrics(spark.read.parquet(stream_dir))
        .select("conv_id", "turn_idx", "turn_gap_s")
        .toPandas()
    )
    merged = batch.merge(got, on=["conv_id", "turn_idx"], suffixes=("_b", "_s"))
    assert len(merged) == len(batch) == len(got)
    import numpy as np

    a = merged.turn_gap_s_b.to_numpy(np.float32)
    b = merged.turn_gap_s_s.to_numpy(np.float32)
    both_nan = np.isnan(a) & np.isnan(b)
    assert (both_nan | (a.view(np.uint32) == b.view(np.uint32))).all()


def test_stream_coarser_tiers_ride_along(spark, stream_dir, tmp_path):
    """coarser=(1h, 1d) rides the coarse tiers along the streaming 1m sink:
    after the stream drains, the streamed 1h and 1d tables must equal the
    batch groupBy over all finalized data — a streaming deployment gets
    1h/1d freshness without waiting for the batch refresh."""
    from olympian_spark.sources.catalog import ParquetManifestCatalog
    from olympian_spark.streaming.rollup_stream import stream_rollup_to_catalog

    cat = ParquetManifestCatalog(spark, str(tmp_path / "catc"))
    stream = read_transcripts_stream(spark, stream_dir)
    agg = streaming_rollup_1m(stream, watermark="0 seconds")
    writer = stream_rollup_to_catalog(
        agg, cat, "c_1m", str(tmp_path / "ckc"),
        coarser=(("c_1h", "hour"), ("c_1d", "day")),
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    fine = cat.read("c_1m").drop("bucket_date")
    for ctable, grain in (("c_1h", "hour"), ("c_1d", "day")):
        got = cat.read(ctable).drop("bucket_date").toPandas()
        batch = (
            fine.groupBy(
                F.date_trunc(grain, "bucket_start").alias("bucket_start"), "conv_id"
            )
            .agg(F.sum("n_turns").alias("n_turns"),
                 F.sum("sum_text_len").alias("sum_text_len"))
            .toPandas()
        )
        merged = got.merge(
            batch, on=["conv_id", "bucket_start"], suffixes=("_s", "_b")
        )
        assert len(merged) == len(got) == len(batch) > 0, f"{ctable}: keyspace"
        assert not got.duplicated(["conv_id", "bucket_start"]).any()
        assert (merged.n_turns_s == merged.n_turns_b).all(), ctable
        assert (merged.sum_text_len_s == merged.sum_text_len_b).all(), ctable
        snaps = cat._load_manifest(ctable)["snapshots"]
        assert all(s["input_watermark"].startswith("epoch=") for s in snaps)


def test_stream_coarser_tiers_restart_no_dupes(spark, stream_dir, tmp_path):
    """Restart-from-checkpoint with coarser tables enabled: the second
    availableNow pass re-processes nothing, and a re-delivered epoch would
    anti-join away its own rows — all three tables stay duplicate-free and
    equal to batch."""
    from olympian_spark.sources.catalog import ParquetManifestCatalog
    from olympian_spark.streaming.rollup_stream import stream_rollup_to_catalog

    cat = ParquetManifestCatalog(spark, str(tmp_path / "catr"))
    stream = read_transcripts_stream(spark, stream_dir)
    agg = streaming_rollup_1m(stream, watermark="0 seconds")
    coarser = (("r_1h", "hour"), ("r_1d", "day"))
    for _pass in range(2):
        q = (
            stream_rollup_to_catalog(
                agg, cat, "r_1m", str(tmp_path / "ckr"), coarser=coarser
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    fine = cat.read("r_1m").drop("bucket_date")
    assert not fine.toPandas().duplicated(["conv_id", "bucket_start"]).any()
    for ctable, grain in coarser:
        got = cat.read(ctable).drop("bucket_date").toPandas()
        assert not got.duplicated(["conv_id", "bucket_start"]).any(), ctable
        batch = (
            fine.groupBy(
                F.date_trunc(grain, "bucket_start").alias("bucket_start"), "conv_id"
            )
            .agg(F.sum("n_turns").alias("n_turns"),
                 F.sum("sum_text_len").alias("sum_text_len"))
            .toPandas()
        )
        merged = got.merge(batch, on=["conv_id", "bucket_start"], suffixes=("_s", "_b"))
        assert len(merged) == len(got) == len(batch) > 0, ctable
        assert (merged.n_turns_s == merged.n_turns_b).all(), ctable


def test_coarser_ride_along_rejects_non_decomposable_measures(spark, tmp_path):
    """Wiring the coarser ride-along to a frame carrying batch-tier
    columns (means/p95 — not sum-decomposable) must raise at wiring time,
    not silently SUM them into wrong coarse values."""
    from olympian_spark.sources.catalog import ParquetManifestCatalog
    from olympian_spark.streaming.rollup_stream import stream_rollup_to_catalog

    cat = ParquetManifestCatalog(spark, str(tmp_path / "wh"))
    bad = (
        spark.readStream.format("rate").load()
        .selectExpr(
            "'c0' AS conv_id",
            "timestamp AS bucket_start",
            "value AS n_turns",
            "CAST(value AS float) AS mean_gap",  # batch-tier, not decomposable
        )
    )
    with pytest.raises(ValueError, match="sum-decomposable"):
        stream_rollup_to_catalog(
            bad, cat, "tier_1m_s", str(tmp_path / "ck"),
            coarser=(("tier_1h_s", "hour"),),
        )


@pytest.fixture(scope="module")
def doc_stream_dir(tmp_path_factory):
    """Two micro-batch files of documents with cross-batch duplicates:
    batch1 re-sends half of batch0's texts under new ids."""
    d = tmp_path_factory.mktemp("docstream")
    texts = [f"document body {i}" for i in range(100)]
    b0 = pd.DataFrame({"doc_id": range(100), "text": texts})
    b1 = pd.DataFrame(
        {"doc_id": range(100, 200),
         "text": [texts[i] if i < 50 else f"fresh body {i}" for i in range(100)]}
    )
    for i, part in enumerate((b0, b1)):
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(str(d), f"batch{i}.parquet"))
    return str(d)


def test_streaming_exact_dedup_cross_batch(spark, doc_stream_dir, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from olympian_spark.streaming.dedup_stream import streaming_exact_dedup

    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .parquet(doc_stream_dir)
    )
    out = streaming_exact_dedup(stream)
    q = (
        out.writeStream.format("memory").queryName("sdedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sdedup").toPandas()
    # 100 batch0 texts + 50 fresh batch1 texts = 150 distinct fingerprints
    assert len(got) == 150
    assert got["fingerprint"].nunique() == 150
    # cross-batch: every duplicated text must be represented by its
    # batch0 row (earlier micro-batch wins via state)
    dup_texts = {f"document body {i}" for i in range(50)}
    kept_ids = {r.text: r.doc_id for r in got.itertuples()}
    for t in dup_texts:
        assert kept_ids[t] < 100, f"batch1 copy won for {t!r}"
    # matches the batch-side exact dedup keyspace
    from olympian_spark.operators.dedup import exact_dedup
    batch = exact_dedup(spark.read.parquet(doc_stream_dir))
    assert sorted(got["fingerprint"]) == sorted(
        r["fingerprint"] for r in batch.select("fingerprint").collect()
    )


def test_streaming_sessions_match_batch(spark, stream_dir, tmp_path):
    """session_window on the stream == the same session_window in batch ==
    the lag-gap sessionization (three independent formulations of one
    semantics)."""
    from olympian_spark.streaming.rollup_stream import streaming_sessions

    stream = read_transcripts_stream(spark, stream_dir)
    q = (
        streaming_sessions(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.format("memory").queryName("ssess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cks"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT * FROM ssess ORDER BY conv_id, session_start"
    ).toPandas()

    batch_all = (
        spark.read.parquet(stream_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"),
             F.sum(F.length("text")).alias("sum_text_len"))
        .selectExpr("conv_id", "w.start AS session_start", "w.end AS session_end",
                    "n_turns", "sum_text_len")
        .orderBy("conv_id", "session_start")
        .toPandas()
    )
    # append mode only finalizes sessions whose end passed the final
    # watermark (= max event time): the globally-last session stays open
    max_ts = spark.read.parquet(stream_dir).agg(F.max("ts")).collect()[0][0]
    batch = batch_all[batch_all["session_end"] <= max_ts].reset_index(drop=True)
    assert len(batch_all) - len(batch) >= 1  # at least the open tail session
    assert len(got) == len(batch)
    assert got.reset_index(drop=True).equals(batch)

    # lag-gap formulation: session count per conv matches
    from pyspark.sql import Window as W

    df = spark.read.parquet(stream_dir)
    w = W.partitionBy("conv_id").orderBy("ts")
    gaps = df.withColumn("prev", F.lag("ts").over(w)).withColumn(
        "new_sess",
        (F.col("prev").isNull())
        | ((F.unix_micros("ts") - F.unix_micros("prev")) > 30 * 60 * 1_000_000),
    )
    lag_counts = (
        gaps.groupBy("conv_id").agg(F.sum(F.col("new_sess").cast("long")).alias("n"))
        .orderBy("conv_id").toPandas()
    )
    sw_counts = (
        batch_all.groupby("conv_id").size().reset_index(name="n").sort_values("conv_id")
    )
    assert list(lag_counts["n"]) == list(sw_counts["n"])
