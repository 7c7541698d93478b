"""Storage catalog: Iceberg-shaped API with a copy-on-write parquet fallback.

The production target is Iceberg (`df.writeTo(t).overwritePartitions()`,
`DELETE WHERE`, snapshot/time-travel, per-snapshot manifests). This sandbox
ships no Iceberg runtime jar, so :class:`ParquetManifestCatalog` implements
the same table-format semantics from scratch on plain parquet, following
the published lakehouse copy-on-write design (immutable data files + an
atomically-swapped metadata pointer):

- **layout**: every commit writes its partitions into a FRESH snapshot
  directory ``root/<name>/data/s<id>/<part_col>=<value>/*.parquet`` —
  data files are immutable once written, never modified in place
- **commit point**: an atomic manifest swap (`os.replace`) appends the
  snapshot record to ``root/<name>/_manifest.json`` with per-partition
  lineage + metrics (rows, bytes, wall_s, input_watermark). A crash before
  the swap leaves an orphan directory invisible to every reader (healed by
  the idempotent rerun, reclaimed by ``expire_snapshots``) — true snapshot
  isolation, not best-effort
- **overwrite_partitions**: only partitions present in the incoming
  DataFrame advance to the new snapshot; all others keep pointing at their
  prior snapshot's files (Iceberg ``overwritePartitions`` semantics).
  Because the write never touches existing files, read-modify-write
  refreshes need no defensive materialization
- **time travel**: ``read(table, as_of=snapshot_id)`` reconstructs any
  historical state by folding the manifest up to that snapshot;
  ``rollback`` appends a snapshot that restores a prior state (the old
  snapshots remain readable — Iceberg rollback semantics)
- **retention**: ``delete_where_older`` is metadata-only (partitions drop
  out of the live set; files stay until vacuumed) — the Iceberg
  ``DELETE WHERE`` partition-predicate fast path
- **vacuum**: ``expire_snapshots`` physically reclaims files no reachable
  snapshot references (Iceberg ``expireSnapshots`` + orphan-file removal)
- **incremental refresh**: callers compute only changed partitions (from
  the input watermark recorded in the last snapshot) and overwrite those.

Single-writer-per-table is assumed (as with Iceberg's optimistic locking,
concurrent writers need a coordinating catalog service; at 100 TB that is
the metastore's job). Readers are always consistent: they see whichever
manifest version their fold started from. Real Iceberg remains a config
flip via :class:`IcebergCatalog`.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from urllib.parse import unquote
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _json_stat(v):
    """Parquet row-group statistic -> JSON-storable, order-preserving value
    (bytes decode to str; datetimes to ISO strings — lexicographic order
    matches chronological for ISO timestamps)."""
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


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

    def _snap_dir(self, table: str, snapshot_id: int) -> str:
        return os.path.join(self._data_dir(table), f"s{snapshot_id}")

    def current_snapshot(self, table: str) -> dict | None:
        snaps = self._load_manifest(table)["snapshots"]
        return snaps[-1] if snaps else None

    @staticmethod
    def _fold(snaps: list, as_of: int | None = None) -> dict:
        """Partition -> lineage record at snapshot ``as_of`` (None = head).

        ``rollback`` records restore the state at their target snapshot;
        ``expire_snapshots`` is physical-only and does not change state.
        """
        live: dict = {}
        for snap in snaps:
            if as_of is not None and snap["snapshot_id"] > as_of:
                break
            op = snap["op"]
            if op == "retention_delete":
                for p in snap["partitions"]:
                    live.pop(p, None)
            elif op == "rollback":
                live = ParquetManifestCatalog._fold(snaps, as_of=snap["target"])
            elif op in ("overwrite_partitions", "compact", "base"):
                if op == "base":
                    # a "base" record (manifest checkpoint) IS the complete
                    # state at its id — it replaces, never merges. This
                    # matters when a checkpoint preserves tagged states as
                    # earlier base records: partitions live in a tag but
                    # dropped since must not leak into later states.
                    live = {}
                for p, rec in snap["partitions"].items():
                    live[p] = {
                        **rec,
                        # a "base" record carries each partition's owning
                        # data directory explicitly; live commits own every
                        # partition they list
                        "snapshot_id": rec.get("data_snapshot_id", snap["snapshot_id"]),
                        "partition_col": rec.get(
                            "partition_col", snap.get("partition_col", "bucket_date")
                        ),
                    }
        return live

    def committed_partitions(self, table: str, as_of: int | None = None) -> dict:
        """Live partition -> lineage record, folding snapshots up to
        ``as_of`` (default: current state)."""
        return self._fold(self._load_manifest(table)["snapshots"], as_of)

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
        _op: str = "overwrite_partitions",
        distribute: bool = True,
        extra_meta: dict | None = None,
        stats_cols: list | None = None,
    ) -> dict:
        """Copy-on-write partition overwrite + atomic manifest commit.

        ``distribute`` hash-partitions the write by ``partition_col``
        (Iceberg's hash distribution-mode): without it, EVERY task writes
        a file into EVERY partition directory it holds rows for —
        tasks x days files (measured: 14k files for 8k day-partitions at
        8 cores), which serializes commits on file-create latency and
        degrades later scans. With it, each partition value lands in
        exactly one task -> one file per partition. The trade: a single
        huge day writes through one task — size-based file splitting (and
        restoring intra-day write parallelism) is the compaction/Iceberg
        target-file-size concern, while day-partitioned tier tables are
        post-aggregation and small per day. Callers that pre-shape their
        layout (compaction's target-size repartition) pass False.

        The incoming partitions are written into a FRESH snapshot directory
        (one Spark job — no defensive checkpoint: existing files are never
        touched, so a refresh that reads this table while overwriting it is
        safe by construction). Per-partition row/byte metrics come from the
        written parquet footers (driver-side metadata read, no second scan).
        Only partitions present in ``df`` advance to the new snapshot;
        everything else keeps its prior files (Iceberg overwritePartitions
        semantics). Returns the snapshot record.
        """
        import pyarrow.parquet as pq

        t0 = time.time()
        m = self._load_manifest(table)
        sid = (m["snapshots"][-1]["snapshot_id"] + 1) if m["snapshots"] else 1
        sdir = self._snap_dir(table, sid)
        # A crashed (uncommitted) attempt may have left files at this same
        # snapshot id. mode=overwrite alone is not enough to clear them when
        # the session runs with partitionOverwriteMode=dynamic (only the
        # partitions present in df would be replaced, and the footer scan
        # below would then commit the stale leftovers) — remove the whole
        # uncommitted dir first.
        if os.path.isdir(sdir):
            shutil.rmtree(sdir, ignore_errors=True)
        if distribute:
            n = 2 * self.spark.sparkContext.defaultParallelism
            df = df.repartition(n, partition_col)
        df.write.mode("overwrite").partitionBy(partition_col).parquet(sdir)
        wall = time.time() - t0

        # Per-partition metrics from parquet footers. The reads are
        # I/O-bound metadata fetches and a commit can touch thousands of
        # day partitions (heavy-tailed histories), so they run on a thread
        # pool — sequential footer opens would serialize the commit on
        # object storage latency.
        def _part_metrics(d: str):
            # Manifest partition values are stored in Spark's escaped
            # directory-name form (consistent with every path-rebuild and
            # the vacuum reference set); comparisons against real column
            # values unescape at the comparison site.
            pval = d.split("=", 1)[1]
            pdir = os.path.join(sdir, d)
            files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            rec = {
                "rows": 0,
                "bytes": int(sum(
                    os.path.getsize(os.path.join(pdir, f)) for f in files
                )),
                "wall_s": round(wall, 3),
                "input_watermark": input_watermark,
            }
            stats: dict = {}
            for f in files:
                md = pq.ParquetFile(os.path.join(pdir, f)).metadata
                rec["rows"] += md.num_rows
                if not stats_cols:
                    continue
                # Iceberg-style column bounds from parquet row-group
                # footers — metadata only, no data pages read
                name_to_idx = {
                    md.schema.column(i).name: i for i in range(md.num_columns)
                }
                for col in stats_cols:
                    i = name_to_idx.get(col)
                    if i is None:
                        continue
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(i).statistics
                        if st is None or not st.has_min_max:
                            continue
                        lo, hi = _json_stat(st.min), _json_stat(st.max)
                        if col not in stats:
                            stats[col] = [lo, hi]
                        else:
                            stats[col][0] = min(stats[col][0], lo)
                            stats[col][1] = max(stats[col][1], hi)
            if stats:
                rec["stats"] = stats
            return pval, rec

        dirs = [
            d for d in sorted(os.listdir(sdir))
            if d.startswith(f"{partition_col}=")
        ]
        with ThreadPoolExecutor(max_workers=16) as pool:
            parts = dict(pool.map(_part_metrics, dirs))
        return self._append_snapshot(
            table, _op, parts, input_watermark=input_watermark,
            partition_col=partition_col, **(extra_meta or {}),
        )

    @staticmethod
    def _zorder_key(df: DataFrame, cols: list, bits: int = 16):
        """Morton (Z-order) key over ``cols`` as a pure column expression.

        Numeric/timestamp columns are min-max normalized to ``bits``-bit
        ints via ONE global aggregate (broadcast back — no per-column
        sort, unlike rank-based schemes); strings hash into the same
        domain (the Delta OPTIMIZE ZORDER treatment). Bits are then
        interleaved round-robin across columns so a range of keys is a
        hyper-rectangle-ish region of the column space. Returns
        (df_with_stats, key_column).
        """
        aggs = []
        kinds = {}
        for c in cols:
            dt = dict(df.dtypes)[c]
            if dt in ("string", "binary"):
                kinds[c] = "hash"
            else:
                kinds[c] = "num"
                aggs += [
                    F.min(F.col(c).cast("double")).alias(f"_zmn_{c}"),
                    F.max(F.col(c).cast("double")).alias(f"_zmx_{c}"),
                ]
        if aggs:
            df = df.crossJoin(F.broadcast(df.agg(*aggs)))
        top = (1 << bits) - 1
        quant = {}
        for c in cols:
            if kinds[c] == "hash":
                quant[c] = F.pmod(F.xxhash64(F.col(c)), F.lit(1 << bits))
            else:
                span = F.col(f"_zmx_{c}") - F.col(f"_zmn_{c}")
                q = F.floor(
                    (F.col(c).cast("double") - F.col(f"_zmn_{c}"))
                    / F.when(span > 0, span).otherwise(F.lit(1.0))
                    * F.lit(float(top))
                )
                quant[c] = F.coalesce(
                    F.least(F.greatest(q, F.lit(0)), F.lit(top)), F.lit(0)
                ).cast("long")
        key = F.lit(0).cast("long")
        for bit in range(bits):
            for j, c in enumerate(cols):
                key = key + F.shiftleft(
                    F.shiftright(quant[c], bit).bitwiseAND(F.lit(1)),
                    bit * len(cols) + j,
                )
        return df, key

    def compact_partitions(
        self,
        table: str,
        partition_col: str = "bucket_date",
        target_file_bytes: int = 128 << 20,
        sort_by: list | None = None,
        zorder_by: list | None = None,
    ) -> dict | None:
        """Small-file compaction (Iceberg ``rewrite_data_files``): rewrite
        fragmented partitions into ~``target_file_bytes`` files as a NEW
        snapshot; untouched partitions keep their files, prior snapshots
        stay time-travel-readable until vacuumed.

        Frequent incremental/streaming commits each write their own files
        into fresh snapshot directories, so a hot partition accumulates one
        small file per commit — at 100 TB that degrades scan parallelism
        into open-file overhead. A partition qualifies when it holds more
        files than ``ceil(bytes / target_file_bytes)``. Returns the commit
        snapshot, or None if nothing is fragmented. The compaction commit
        carries no input watermark, so refresh resume logic is unaffected.

        ``sort_by`` clusters rows within the rewritten files (Iceberg
        write sort-order): parquet row-group min/max stats on the sort
        columns then let predicate pushdown skip whole row groups, and
        run-length locality compresses better.

        ``zorder_by`` (mutually exclusive with ``sort_by``) clusters by a
        Morton key over SEVERAL columns (Delta OPTIMIZE ZORDER / Iceberg
        z-ordered rewrite): a lexicographic sort gives perfect skipping on
        the leading column and none on the rest, while Z-order gives every
        listed column a bounded per-file min/max box — the layout a 100 TB
        table wants when queries filter on more than one dimension.
        """
        if sort_by and zorder_by:
            raise ValueError("sort_by and zorder_by are mutually exclusive")
        live = self.committed_partitions(table)
        to_do, todo_bytes = [], 0
        for pval, rec in sorted(live.items()):
            if rec["partition_col"] != partition_col:
                continue
            pdir = os.path.join(
                self._snap_dir(table, rec["snapshot_id"]), f"{partition_col}={pval}"
            )
            n_files = sum(1 for f in os.listdir(pdir) if f.endswith(".parquet"))
            n_needed = max(1, -(-rec["bytes"] // target_file_bytes))
            if n_files > n_needed:
                to_do.append(pval)
                todo_bytes += rec["bytes"]
        if not to_do:
            return None
        # to_do holds dir-escaped values (for path rebuilds above); the data
        # filter needs the real column values — unescape for the comparison.
        df = self.read(table).filter(
            F.col(partition_col).cast("string").isin([unquote(p) for p in to_do])
        )
        n_out = max(1, -(-todo_bytes // target_file_bytes))
        if zorder_by:
            cols = list(df.columns)
            df, zkey = self._zorder_key(df, zorder_by)
            df = (
                df.withColumn("_zkey", zkey)
                # range partitions = contiguous Morton-key slabs per
                # partition value -> each output file owns a compact
                # multi-column box
                .repartitionByRange(n_out, partition_col, "_zkey")
                .sortWithinPartitions(partition_col, "_zkey")
                .select(*cols)
            )
        else:
            df = df.repartition(n_out, partition_col)
            if sort_by:
                df = df.sortWithinPartitions(partition_col, *sort_by)
        # distribute=False: the target-size repartition above IS the layout
        return self.overwrite_partitions(
            table, df, partition_col=partition_col, _op="compact", distribute=False
        )

    def checkpoint_manifest(self, table: str) -> dict:
        """Squash manifest history into one base snapshot (Iceberg
        rewrite-manifests + expire).

        Every commit rewrites ``_manifest.json`` in full, and a streaming
        sink appends one snapshot per epoch — unbounded history makes each
        commit O(total history). This vacuums files the current state does
        not reference, then rewrites the manifest as a single ``base``
        record holding the live partition map (each entry keeping its
        owning data directory via ``data_snapshot_id``), the last input
        watermark, and the recorded retention cutoffs. Snapshot ids stay
        monotonic; time travel before the checkpoint is gone (as after
        ``expire_snapshots``) EXCEPT tagged states, which are preserved as
        base-style records at their original ids so tag reads and their
        vacuum protection survive the squash.
        """
        snaps0 = self._load_manifest(table)["snapshots"]
        live = self.committed_partitions(table)
        wm = self.input_watermark(table)
        cutoffs = {}
        for s in snaps0:
            if s["op"] == "retention_delete":
                pc = s.get("partition_col", "bucket_date")
                cutoffs[pc] = max(cutoffs.get(pc, ""), s["cutoff"])
            elif s["op"] == "base":
                for pc, c in s.get("retention_cutoffs", {}).items():
                    cutoffs[pc] = max(cutoffs.get(pc, ""), c)
        # Tags survive the checkpoint: capture each live tag's target state
        # WHILE the history can still be folded; it is re-emitted below as a
        # base-style record at the target's id plus a fresh tag record, so
        # resolve_tag/read_tag keep working and the next expire_snapshots
        # still sees the tagged states as reachable (the documented
        # "protected from vacuuming" guarantee).
        tags: dict[str, int] = {}
        for s in snaps0:
            if s["op"] == "tag":
                tags[s["tag_name"]] = s["target"]  # latest record wins

        def _base_map(state: dict) -> dict:
            out = {}
            for p, rec in state.items():
                r = dict(rec)
                r["data_snapshot_id"] = r.pop("snapshot_id")
                out[p] = r
            return out

        tag_states = {
            t: _base_map(self._fold(snaps0, as_of=t)) for t in set(tags.values())
        }
        self.expire_snapshots(table, keep_last=0)
        last_id = self._load_manifest(table)["snapshots"][-1]["snapshot_id"]
        now = datetime.now(timezone.utc).isoformat()
        snap = {
            "snapshot_id": last_id + 1,
            "op": "base",
            "committed_at": now,
            "partitions": _base_map(live),
            "input_watermark": wm,
            "retention_cutoffs": cutoffs,
        }
        records = [
            {
                "snapshot_id": t,
                "op": "base",
                "committed_at": now,
                "partitions": state,
            }
            for t, state in sorted(tag_states.items())
        ]
        records.append(snap)
        records += [
            {
                "snapshot_id": last_id + 2 + i,
                "op": "tag",
                "committed_at": now,
                "partitions": {},
                "tag_name": name,
                "target": target,
            }
            for i, (name, target) in enumerate(sorted(tags.items()))
        ]
        m = {"table": table, "snapshots": records}
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path(table))
        return snap

    def read(self, table: str, as_of: int | None = None) -> DataFrame:
        """Snapshot-consistent read; ``as_of`` time-travels to a historical
        snapshot id (files must not have been vacuumed since).

        The live partition set is grouped by owning snapshot directory and
        read with ``basePath`` so the partition column survives; partition
        pruning still reaches each directory scan.
        """
        live = self.committed_partitions(table, as_of)
        if not live:
            raise ValueError(f"{table}: no committed partitions"
                             + (f" at snapshot {as_of}" if as_of else ""))
        return self._read_live(table, live)

    def _read_live(self, table: str, live: dict) -> DataFrame:
        """Read an explicit live-partition map (read()'s grouping logic,
        reusable for partition-pruned reads like :meth:`diff_snapshots`)."""
        groups: dict[int, list] = {}
        for pval, rec in live.items():
            groups.setdefault(rec["snapshot_id"], []).append((pval, rec["partition_col"]))
        out = None
        for sid in sorted(groups):
            base = self._snap_dir(table, sid)
            paths = [os.path.join(base, f"{pcol}={pval}") for pval, pcol in groups[sid]]
            part = self.spark.read.option("basePath", base).parquet(*paths)
            # allowMissingColumns = schema evolution: files written before a
            # column was added null-fill it (Iceberg add-column semantics)
            out = part if out is None else out.unionByName(
                part, allowMissingColumns=True
            )
        return out

    def changed_partitions(
        self, table: str, from_snapshot: int, to_snapshot: int | None = None
    ) -> set:
        """Partitions whose owning data differs between two snapshots —
        METADATA-ONLY (manifest fold comparison, no file reads). A
        partition is unchanged iff both states map it to the same owning
        snapshot directory (files are immutable, so same owner = same
        bytes)."""
        a = self.committed_partitions(table, as_of=from_snapshot)
        b = self.committed_partitions(table, as_of=to_snapshot)
        return {
            p
            for p in set(a) | set(b)
            if (p not in a)
            or (p not in b)
            or a[p]["snapshot_id"] != b[p]["snapshot_id"]
        }

    def diff_snapshots(
        self,
        table: str,
        from_snapshot: int,
        to_snapshot: int | None = None,
        key_cols: list | None = None,
    ) -> DataFrame:
        """Snapshot diff (CDC between two time-travel states): rows added
        and removed between ``from_snapshot`` and ``to_snapshot`` (None =
        head), keyed on ``key_cols`` (default: all common columns — exact
        row diff).

        Scale shape: the read set is pruned to :meth:`changed_partitions`
        FIRST — a metadata-only manifest comparison, so diffing two
        snapshots that share 99% of a 100 TB table reads only the
        differing partitions; the anti-joins then shuffle only that
        pruned slice on the key columns.
        """
        changed = self.changed_partitions(table, from_snapshot, to_snapshot)
        old_live = {
            p: r
            for p, r in self.committed_partitions(table, as_of=from_snapshot).items()
            if p in changed
        }
        new_live = {
            p: r
            for p, r in self.committed_partitions(table, as_of=to_snapshot).items()
            if p in changed
        }
        old = self._read_live(table, old_live) if old_live else None
        new = self._read_live(table, new_live) if new_live else None
        if old is None and new is None:
            raise ValueError(f"{table}: snapshots identical, nothing to diff")
        if key_cols is None:
            key_cols = (
                [c for c in new.columns if old is None or c in old.columns]
                if new is not None
                else list(old.columns)
            )
        import pyspark.sql.functions as _F

        def _tag(df, change):
            return df.select(*key_cols).withColumn("change", _F.lit(change))

        if old is None:
            return _tag(new, "added")
        if new is None:
            return _tag(old, "removed")
        added = _tag(new.join(old.select(*key_cols), key_cols, "left_anti"), "added")
        removed = _tag(old.join(new.select(*key_cols), key_cols, "left_anti"), "removed")
        return added.unionByName(removed)

    def pruned_partitions(self, table: str, col: str, lo, hi) -> dict:
        """Live partitions whose manifest [min, max] bounds for ``col``
        overlap [lo, hi] — METADATA-ONLY data skipping (the Iceberg
        lower_bounds/upper_bounds trick at partition granularity).
        Partitions committed without ``stats_cols`` carry no bounds and
        are conservatively kept."""
        lo, hi = _json_stat(lo), _json_stat(hi)
        out = {}
        for pval, rec in self.committed_partitions(table).items():
            bounds = (rec.get("stats") or {}).get(col)
            if bounds is None or not (hi < bounds[0] or lo > bounds[1]):
                out[pval] = rec
        return out

    def read_where_between(self, table: str, col: str, lo, hi) -> DataFrame:
        """Range read with manifest-bounds pruning: only partitions whose
        committed ``col`` bounds overlap [lo, hi] are scanned (the residual
        row filter still applies — bounds are partition-coarse). At 100 TB
        a needle query touches the handful of overlapping partitions'
        files instead of the table."""
        live = self.pruned_partitions(table, col, lo, hi)
        if not live:
            return self.read(table).filter(F.lit(False))
        return self._read_live(table, live).filter(F.col(col).between(lo, hi))

    def verify_table(self, table: str) -> dict:
        """Anti-entropy audit: reconcile the manifest's committed state
        against the files actually on disk, METADATA-ONLY (directory
        listings + parquet footer row counts — no data pages).

        Returns ``{"ok": bool, "partitions": n, "issues": [...]}`` where
        issues name missing partition directories, partitions with zero
        parquet files, and row-count mismatches vs the manifest. The
        check a 100 TB deployment runs after restores/migrations before
        trusting a table — and the cheap invariant a resume path can
        assert.
        """
        import pyarrow.parquet as _pq

        issues = []
        live = self.committed_partitions(table)
        for pval, rec in sorted(live.items()):
            pdir = os.path.join(
                self._snap_dir(table, rec["snapshot_id"]),
                f"{rec['partition_col']}={pval}",
            )
            if not os.path.isdir(pdir):
                issues.append(f"{pval}: missing directory {pdir}")
                continue
            files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            if not files:
                issues.append(f"{pval}: no parquet files in {pdir}")
                continue
            rows = sum(
                _pq.ParquetFile(os.path.join(pdir, f)).metadata.num_rows
                for f in files
            )
            if rows != rec["rows"]:
                issues.append(
                    f"{pval}: manifest says {rec['rows']} rows, files hold {rows}"
                )
        return {"ok": not issues, "partitions": len(live), "issues": issues}

    def delete_where_older(
        self, table: str, cutoff: str, partition_col: str = "bucket_date"
    ) -> dict:
        """Retention expiry: drop whole partitions with value < cutoff.

        Partition-predicate delete — METADATA-ONLY (the Iceberg
        ``DELETE WHERE`` fast path): expired partitions leave the live set
        at the manifest commit; their immutable files remain until
        ``expire_snapshots`` vacuums them, so prior snapshots stay
        time-travel-readable.
        """
        live = self.committed_partitions(table)
        # Manifest values are dir-escaped; compare the unescaped (real)
        # value against the caller's cutoff. No-op for bucket_date.
        dropped = {
            pval: {"rows": 0, "bytes": 0, "wall_s": 0.0}
            for pval, rec in sorted(live.items())
            if rec["partition_col"] == partition_col and unquote(pval) < cutoff
        }
        return self._append_snapshot(
            table, "retention_delete", dropped, cutoff=cutoff, partition_col=partition_col
        )

    def optimize_table(
        self,
        table: str,
        partition_col: str = "bucket_date",
        target_file_bytes: int = 128 << 20,
        sort_by: list | None = None,
        zorder_by: list | None = None,
        keep_last: int = 2,
        checkpoint_over: int = 64,
    ) -> dict:
        """One-call maintenance (the Iceberg OPTIMIZE shape): compact
        fragmented partitions, squash the manifest once it exceeds
        ``checkpoint_over`` snapshots, and vacuum everything unreachable
        beyond ``keep_last`` states (tags stay pinned). Returns a summary
        of what each step did — the cron job a deployment schedules."""
        out: dict = {}
        snap = self.compact_partitions(
            table, partition_col=partition_col,
            target_file_bytes=target_file_bytes,
            sort_by=sort_by, zorder_by=zorder_by,
        )
        out["compacted"] = bool(snap)
        n_snaps = len(self._load_manifest(table)["snapshots"])
        if n_snaps > checkpoint_over:
            self.checkpoint_manifest(table)
            out["checkpointed"] = True
        else:
            out["checkpointed"] = False
        exp = self.expire_snapshots(table, keep_last=keep_last)
        out["removed_dirs"] = exp.get("removed_dirs", 0)
        return out

    def tag_snapshot(self, table: str, name: str, snapshot_id: int | None = None) -> dict:
        """Named snapshot ref (Iceberg tag): pin a state under a stable
        name — readable via ``read(table, tag=...)`` and PROTECTED from
        ``expire_snapshots`` vacuuming however old it gets (release /
        eval-dataset pinning). Tags are append-only manifest records; the
        latest record for a name wins, so re-tagging moves the ref."""
        target = (
            snapshot_id
            if snapshot_id is not None
            else self.current_snapshot(table)["snapshot_id"]
        )
        snaps = self._load_manifest(table)["snapshots"]
        if not any(s["snapshot_id"] == target for s in snaps):
            raise ValueError(f"{table}: unknown snapshot {target}")
        return self._append_snapshot(table, "tag", {}, tag_name=name, target=target)

    def resolve_tag(self, table: str, name: str) -> int:
        for s in reversed(self._load_manifest(table)["snapshots"]):
            if s["op"] == "tag" and s.get("tag_name") == name:
                return s["target"]
        raise ValueError(f"{table}: no tag {name!r}")

    def read_tag(self, table: str, name: str) -> DataFrame:
        """Snapshot-consistent read of a tagged state."""
        return self.read(table, as_of=self.resolve_tag(table, name))

    def rollback(self, table: str, to_snapshot: int) -> dict:
        """Restore the table to a prior snapshot's state by APPENDING a
        rollback record (history is never rewritten — Iceberg semantics).
        """
        snaps = self._load_manifest(table)["snapshots"]
        if not any(s["snapshot_id"] == to_snapshot for s in snaps):
            raise ValueError(f"{table}: unknown snapshot {to_snapshot}")
        return self._append_snapshot(table, "rollback", {}, target=to_snapshot)

    def expire_snapshots(self, table: str, keep_last: int = 0) -> dict:
        """Vacuum: physically delete files no reachable state references.

        Reachable = the current live state, plus the states at each of the
        last ``keep_last`` snapshots (kept time-travel-readable). Also
        reclaims orphan directories from crashed, never-committed writes.
        Time travel to anything older stops working — Iceberg
        ``expireSnapshots`` semantics.
        """
        snaps = self._load_manifest(table)["snapshots"]
        committed_ids = [s["snapshot_id"] for s in snaps]
        keep_states = [None] + (committed_ids[-keep_last:] if keep_last > 0 else [])
        # tagged snapshots are pinned refs (Iceberg tag semantics): their
        # states stay reachable however old they are
        keep_states += [
            s["target"] for s in snaps if s["op"] == "tag"
        ]
        referenced = set()
        for as_of in keep_states:
            for pval, rec in self._fold(snaps, as_of).items():
                referenced.add((rec["snapshot_id"], rec["partition_col"], pval))
        removed = 0
        data = self._data_dir(table)
        if os.path.isdir(data):
            for d in sorted(os.listdir(data)):
                if not (d.startswith("s") and d[1:].isdigit()):
                    continue
                sid = int(d[1:])
                sdir = os.path.join(data, d)
                if sid > (committed_ids[-1] if committed_ids else 0):
                    shutil.rmtree(sdir)  # orphan of a crashed commit
                    removed += 1
                    continue
                for pd_ in sorted(os.listdir(sdir)):
                    if "=" not in pd_:
                        continue
                    pcol, pval = pd_.split("=", 1)
                    if (sid, pcol, pval) not in referenced:
                        shutil.rmtree(os.path.join(sdir, pd_))
                        removed += 1
                if not any("=" in e for e in os.listdir(sdir)):
                    shutil.rmtree(sdir)
        return self._append_snapshot(
            table, "expire_snapshots", {}, removed_dirs=removed, keep_last=keep_last
        )

    def retention_cutoff(self, table: str, partition_col: str = "bucket_date") -> str | None:
        """Latest retention cutoff recorded for the table (max over all
        ``retention_delete`` snapshots), or None if retention never ran.
        Writers consult this to avoid re-creating expired partitions."""
        cutoffs = []
        for s in self._load_manifest(table)["snapshots"]:
            if (
                s["op"] == "retention_delete"
                and s.get("partition_col", "bucket_date") == partition_col
            ):
                cutoffs.append(s["cutoff"])
            elif s["op"] == "base":  # manifest checkpoint preserves cutoffs
                c = s.get("retention_cutoffs", {}).get(partition_col)
                if c:
                    cutoffs.append(c)
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
        full = f"{self.catalog}.{table}"
        writer = df.writeTo(full)
        if input_watermark:
            writer = writer.option("snapshot-property.input_watermark", input_watermark)
        if not self.spark.catalog.tableExists(full):
            # first commit creates the partitioned table (overwritePartitions
            # requires an existing table)
            writer.partitionedBy(F.col(partition_col)).create()
        else:
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

    # ---- maintenance (same surface as the fallback; Iceberg procedures) ----

    def compact_partitions(self, table: str, partition_col: str = "bucket_date",
                           target_file_bytes: int = 128 << 20,
                           sort_by: list | None = None):
        sort = f", strategy => 'sort', sort_order => '{', '.join(sort_by)}'" if sort_by else ""
        return self.spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files("
            f"table => '{table}', "
            f"options => map('target-file-size-bytes', '{target_file_bytes}')"
            f"{sort})"
        ).first()

    def expire_snapshots(self, table: str, keep_last: int = 1):
        return self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots("
            f"table => '{table}', retain_last => {max(1, keep_last)})"
        ).first()

    def checkpoint_manifest(self, table: str):
        return self.spark.sql(
            f"CALL {self.catalog}.system.rewrite_manifests(table => '{table}')"
        ).first()

    def rollback(self, table: str, to_snapshot: int):
        return self.spark.sql(
            f"CALL {self.catalog}.system.rollback_to_snapshot("
            f"table => '{table}', snapshot_id => {to_snapshot})"
        ).first()
