"""Storage catalog: Iceberg-shaped API with a partitioned-parquet fallback.

The production target is Iceberg (`df.writeTo(t).overwritePartitions()`,
`DELETE WHERE`, snapshot/time-travel, per-snapshot manifests). This sandbox
ships no Iceberg runtime jar, so :class:`ParquetManifestCatalog` provides
the same contract on plain parquet:

- **tables** at ``root/<name>/data/<part_col>=<value>/*.parquet``
- **snapshots**: every commit appends a snapshot record to
  ``root/<name>/_manifest.json`` with per-partition lineage + metrics
  (rows, bytes, wall_s, input_watermark) — the resume/lineage contract of
  the north rule
- **overwrite_partitions**: dynamic partition overwrite — only partitions
  present in the incoming DataFrame are replaced (Iceberg
  ``overwritePartitions`` semantics), making refreshes idempotent and
  therefore resumable: a crashed job reruns and converges to the same state
- **retention**: ``delete_where_older`` drops whole partitions by predicate
  (Iceberg ``DELETE WHERE bucket_date < cutoff`` maps to partition drops —
  metadata-only, no rewrite)
- **incremental refresh**: callers compute only changed partitions (from
  the input watermark recorded in the last snapshot) and overwrite those.

Consistency note (fallback only): parquet has no atomic multi-partition
commit; the manifest append is the commit point — readers that follow the
manifest's committed partition list get snapshot-consistent views, and a
crash between data write and manifest append is healed by the idempotent
rerun. Real Iceberg replaces this with true snapshot isolation; the API is
shaped so the swap is a config flip.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetManifestCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---------- paths / manifest ----------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _data_dir(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "data")

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_manifest.json")

    def _load_manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"table": table, "snapshots": []}

    def _append_snapshot(self, table: str, op: str, partitions: dict, **extra) -> dict:
        m = self._load_manifest(table)
        snap = {
            "snapshot_id": (m["snapshots"][-1]["snapshot_id"] + 1) if m["snapshots"] else 1,
            "op": op,
            "committed_at": datetime.now(timezone.utc).isoformat(),
            "partitions": partitions,
            **extra,
        }
        m["snapshots"].append(snap)
        os.makedirs(self._table_dir(table), exist_ok=True)
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path(table))  # atomic commit point
        return snap

    def current_snapshot(self, table: str) -> dict | None:
        snaps = self._load_manifest(table)["snapshots"]
        return snaps[-1] if snaps else None

    def committed_partitions(self, table: str) -> dict:
        """Live partition -> lineage record, folding all snapshots."""
        live: dict = {}
        for snap in self._load_manifest(table)["snapshots"]:
            if snap["op"] == "retention_delete":
                for p in snap["partitions"]:
                    live.pop(p, None)
            else:
                for p, rec in snap["partitions"].items():
                    live[p] = {**rec, "snapshot_id": snap["snapshot_id"]}
        return live

    def input_watermark(self, table: str) -> str | None:
        for snap in reversed(self._load_manifest(table)["snapshots"]):
            wm = snap.get("input_watermark")
            if wm:
                return wm
        return None

    # ---------- data ops ----------
    def overwrite_partitions(
        self,
        table: str,
        df: DataFrame,
        partition_col: str = "bucket_date",
        input_watermark: str | None = None,
    ) -> dict:
        """Dynamic partition overwrite + manifest commit.

        Only partitions present in ``df`` are replaced; everything else is
        untouched (Iceberg overwritePartitions semantics). Returns the
        snapshot record.
        """
        t0 = time.time()
        # read-modify-write safety: an incremental refresh merges rows read
        # from THIS table's files; materialize the plan before replacing them
        # (real Iceberg gets this from snapshot isolation)
        df = df.localCheckpoint(eager=True)
        rows = {str(r[0]): r[1] for r in df.groupBy(partition_col).count().collect()}
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(partition_col).parquet(
                self._data_dir(table)
            )
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        wall = time.time() - t0
        parts = {}
        for pval, nrows in rows.items():
            pdir = os.path.join(self._data_dir(table), f"{partition_col}={pval}")
            nbytes = sum(
                os.path.getsize(os.path.join(pdir, f))
                for f in os.listdir(pdir)
                if f.endswith(".parquet")
            ) if os.path.isdir(pdir) else 0
            parts[pval] = {
                "rows": int(nrows),
                "bytes": int(nbytes),
                "wall_s": round(wall, 3),
                "input_watermark": input_watermark,
            }
        return self._append_snapshot(
            table, "overwrite_partitions", parts, input_watermark=input_watermark,
            partition_col=partition_col,
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self._data_dir(table))

    def delete_where_older(
        self, table: str, cutoff: str, partition_col: str = "bucket_date"
    ) -> dict:
        """Retention expiry: drop whole partitions with value < cutoff.

        Partition-predicate delete — metadata + directory removal only, no
        data rewrite (the Iceberg ``DELETE WHERE`` fast path).
        """
        dropped = {}
        data = self._data_dir(table)
        if os.path.isdir(data):
            for d in sorted(os.listdir(data)):
                if not d.startswith(f"{partition_col}="):
                    continue
                pval = d.split("=", 1)[1]
                if pval < cutoff:
                    shutil.rmtree(os.path.join(data, d))
                    dropped[pval] = {"rows": 0, "bytes": 0, "wall_s": 0.0}
        return self._append_snapshot(
            table, "retention_delete", dropped, cutoff=cutoff, partition_col=partition_col
        )

    def retention_cutoff(self, table: str, partition_col: str = "bucket_date") -> str | None:
        """Latest retention cutoff recorded for the table (max over all
        ``retention_delete`` snapshots), or None if retention never ran.
        Writers consult this to avoid re-creating expired partitions."""
        cutoffs = [
            s["cutoff"]
            for s in self._load_manifest(table)["snapshots"]
            if s["op"] == "retention_delete"
            and s.get("partition_col", "bucket_date") == partition_col
        ]
        return max(cutoffs) if cutoffs else None

    def manifest_df(self, table: str) -> DataFrame:
        """The manifest as a DataFrame (MANIFEST_SCHEMA shape) for SQL over
        lineage/metrics."""
        recs = []
        for snap in self._load_manifest(table)["snapshots"]:
            for pval, rec in snap["partitions"].items():
                recs.append(
                    {
                        "table_name": table,
                        "partition_value": pval,
                        "snapshot_id": snap["snapshot_id"],
                        "op": snap["op"],
                        "input_watermark": rec.get("input_watermark"),
                        "rows": rec.get("rows", 0),
                        "bytes": rec.get("bytes", 0),
                        "wall_s": float(rec.get("wall_s", 0.0)),
                        "committed_at": snap["committed_at"],
                    }
                )
        if not recs:
            return self.spark.createDataFrame(
                [],
                "table_name string, partition_value string, snapshot_id long,"
                " op string, input_watermark string, rows long, bytes long,"
                " wall_s double, committed_at string",
            )
        return self.spark.createDataFrame(recs)


def with_bucket_date(df: DataFrame, src_col: str = "bucket_start") -> DataFrame:
    """Standard partition column: calendar date of the bucket."""
    return df.withColumn("bucket_date", F.to_date(F.col(src_col)))


class IcebergCatalog:
    """Production storage backend: the same contract as
    :class:`ParquetManifestCatalog` implemented with real Iceberg operations.

    Requires an Iceberg runtime jar + a configured catalog (not present in
    this sandbox — the constructor verifies and raises with instructions).
    The method bodies are the exact production translations of the fallback:

    - overwrite_partitions -> ``df.writeTo(table).overwritePartitions()``
      (snapshot-isolated dynamic overwrite)
    - delete_where_older   -> ``DELETE FROM t WHERE bucket_date < cutoff``
      (metadata-only partition drop for partition-aligned predicates)
    - committed_partitions / lineage -> the ``.snapshots`` / ``.files``
      metadata tables; input watermarks ride on snapshot summary properties
      via ``spark.sql(... SET TBLPROPERTIES ...)`` or write options.
    """

    def __init__(self, spark: SparkSession, catalog_name: str = "iceberg"):
        self.spark = spark
        self.catalog = catalog_name
        impl = spark.conf.get(f"spark.sql.catalog.{catalog_name}", None)
        if not impl:
            raise RuntimeError(
                f"No Iceberg catalog '{catalog_name}' configured "
                "(spark.sql.catalog.* unset / runtime jar missing). Use "
                "ParquetManifestCatalog in this sandbox; on a cluster, add "
                "iceberg-spark-runtime and spark.sql.catalog.iceberg=..."
            )

    def overwrite_partitions(self, table: str, df: DataFrame,
                             partition_col: str = "bucket_date",
                             input_watermark: str | None = None):
        writer = df.writeTo(f"{self.catalog}.{table}")
        if input_watermark:
            writer = writer.option("snapshot-property.input_watermark", input_watermark)
        writer.overwritePartitions()
        return self.current_snapshot(table)

    def read(self, table: str) -> DataFrame:
        return self.spark.table(f"{self.catalog}.{table}")

    def delete_where_older(self, table: str, cutoff: str,
                           partition_col: str = "bucket_date"):
        self.spark.sql(
            f"DELETE FROM {self.catalog}.{table} WHERE {partition_col} < DATE '{cutoff}'"
        )
        return self.current_snapshot(table)

    def current_snapshot(self, table: str):
        row = (
            self.spark.table(f"{self.catalog}.{table}.snapshots")
            .orderBy("committed_at", ascending=False)
            .first()
        )
        return row.asDict() if row else None

    def input_watermark(self, table: str) -> str | None:
        snap = self.current_snapshot(table)
        return (snap or {}).get("summary", {}).get("input_watermark")

    def manifest_df(self, table: str) -> DataFrame:
        return self.spark.table(f"{self.catalog}.{table}.files")
