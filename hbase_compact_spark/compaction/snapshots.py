"""Iceberg-style snapshot log: versioned atomic table states, time
travel, and compaction that never deletes what a reader might hold.

The swap-manifest path (executor/reader) makes IN-PLACE compaction
safe on object stores; this module is the next rung: a tiny log of
COMPLETE table states under `<root>/_snapshots/v<NNNNNNNNNNNN>.json`.
Each snapshot lists every live data file (relative path + size) plus
lineage metadata. Commit is a temp-write + rename onto the next
version number — rename-if-absent is the optimistic-concurrency
token, so two concurrent committers can both win consecutive numbers
but never clobber each other (the loser re-reads and retries).

Under the log, compaction becomes append-only (`snapshot_compact`):
rewritten files land beside the old ones under fresh uuid names, the
new snapshot references only the new set, and the old files stay on
disk — invisible to snapshot-resolved readers but fully readable via
any retained older version (`read_table_at`). Physical deletion is
deferred to `expire_snapshots`, which drops only files referenced
exclusively by expired versions. A crash anywhere leaves either the
old snapshot authoritative (unreferenced new files are garbage, swept
by expire) or the new one committed — readers can never observe a
mixed file set, with no reconcile step at all.

Generalizes the reference's implicit reliance on HBase's store-file
manifest for read-during-compaction safety (QHBaseCompact.java flows
2-3: compact + poll while scans continue) to bare parquet trees.
"""

from __future__ import annotations

import hashlib
import posixpath
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from hbase_compact_spark.compaction.executor import (
    _fingerprint,
    _hadoop_fs,
    _read_json,
    _rm,
    _uri_path,
    _write_json,
    list_partition_files,
)

SNAPSHOT_DIR = "_snapshots"


class SnapshotLog:
    """The version log for one table root."""

    def __init__(self, spark: SparkSession, table_root: str):
        self.spark = spark
        self.table_root = table_root
        self.log_dir = posixpath.join(table_root, SNAPSHOT_DIR)
        self._fs, self._root, self._jvm = _hadoop_fs(spark, table_root)
        self._Path = self._jvm.org.apache.hadoop.fs.Path

    # ---------------------------------------------------------- reads
    def versions(self) -> list[int]:
        p = self._Path(self.log_dir)
        if not self._fs.exists(p):
            return []
        out = []
        for st in self._fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def latest(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def read(self, version: int) -> dict:
        return _read_json(
            self._fs, self._jvm, self._Path(self.log_dir, f"v{version:012d}.json")
        )

    def files(self, version: int | None = None) -> list[tuple[str, int]]:
        """[(relative path, size)] of the given (default: latest)
        snapshot."""
        v = self.latest() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no snapshots under {self.log_dir}")
        return [(f[0], int(f[1])) for f in self.read(v)["files"]]

    # --------------------------------------------------------- writes
    def commit(
        self, files: list[tuple[str, int]], op: str, parent: int | None = None
    ) -> int:
        """Atomically claim the next version. The temp file is fully
        written first; rename-if-absent is the only commit point, so a
        losing racer just retries on the next number."""
        fs, Path = self._fs, self._Path
        fs.mkdirs(Path(self.log_dir))
        payload = {
            "op": op,
            "parent": parent,
            "committed_at": int(time.time()),
            "files": [[p, int(s)] for p, s in sorted(files)],
        }
        tmp = Path(self.log_dir, f"_tmp-{uuid.uuid4().hex[:10]}.json")
        for _ in range(50):
            n = (self.latest() or 0) + 1
            payload["version"], payload["parent"] = n, parent if parent is not None else n - 1 or None
            _write_json(fs, Path, tmp, payload)
            dest = Path(self.log_dir, f"v{n:012d}.json")
            if not fs.exists(dest) and fs.rename(tmp, dest):
                return n
        fs.delete(tmp, False)
        raise RuntimeError(f"could not claim a snapshot version in {self.log_dir}")

    def bootstrap(self) -> int:
        """v1 = the table's current physical listing (no-op if the log
        already exists)."""
        v = self.latest()
        if v is not None:
            return v
        listing = list_partition_files(self.spark, self.table_root)
        files = [
            (self._rel(uri), size)
            for rel, fl in listing.items()
            for uri, size in fl
        ]
        return self.commit(files, op="bootstrap", parent=None)

    def _rel(self, uri: str) -> str:
        root_abs = _uri_path(str(self._fs.makeQualified(self._root))).rstrip("/")
        p = _uri_path(uri)
        return p[len(root_abs) + 1 :] if p.startswith(root_abs + "/") else p


def read_table_at(
    spark: SparkSession, table_root: str, version: int | None = None
) -> DataFrame:
    """Time travel: read the table exactly as of `version` (default:
    latest committed snapshot). Mid-compaction states are unobservable
    by construction — uncommitted files are simply not listed."""
    log = SnapshotLog(spark, table_root)
    paths = [
        posixpath.join(table_root, p) for p, _ in log.files(version)
    ]
    if not paths:
        raise FileNotFoundError(f"snapshot lists no files under {table_root}")
    # basePath keeps hive partition columns (region=...) alive when
    # reading an explicit file list instead of the directory tree
    return spark.read.option("basePath", table_root).parquet(*paths)


def snapshot_compact(
    spark: SparkSession,
    table_root: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> dict:
    """Append-only compaction under the snapshot log: qualifying
    partitions (>1 file and a strictly lower planned bin count — the
    reference's filenum>1 gate, QHC.java:151) are rewritten into fresh
    uuid-named files, verified (row count + order-insensitive content
    fingerprint, same gate as executor._compact_one), and ONE new
    snapshot referencing old-files-minus-replaced-plus-new is
    committed. Old files are not touched — readers of any retained
    version keep working; `expire_snapshots` reclaims.

    Returns {"version": committed (or current, if nothing qualified),
    "rewritten": n_partitions, "new_files": n}.
    """
    import math

    log = SnapshotLog(spark, table_root)
    log.bootstrap()
    base_version = log.latest()
    base = log.files(base_version)
    fs, _, jvm = _hadoop_fs(spark, table_root)
    Path = jvm.org.apache.hadoop.fs.Path

    by_part: dict[str, list[tuple[str, int]]] = {}
    for relpath, size in base:
        by_part.setdefault(posixpath.dirname(relpath), []).append((relpath, size))

    keep: list[tuple[str, int]] = []
    added: list[tuple[str, int]] = []
    rewritten = 0
    for part_rel in sorted(by_part):
        files = by_part[part_rel]
        total = sum(s for _, s in files)
        n_bins = max(1, math.ceil(total / target_bytes))
        if len(files) <= 1 or n_bins >= len(files):
            keep.extend(files)
            continue
        srcs = [posixpath.join(table_root, p) for p, _ in files]
        tmp_dir = posixpath.join(
            table_root,
            f"_snapcompact_tmp_{hashlib.md5(part_rel.encode()).hexdigest()[:12]}",
        )
        src = spark.read.parquet(*srcs)
        writer = src.repartition(n_bins)
        if sort_by:
            writer = writer.sortWithinPartitions(*sort_by)
        writer.write.mode("overwrite").parquet(tmp_dir)
        out = spark.read.parquet(tmp_dir)
        if _fingerprint(src) != _fingerprint(out):
            _rm(spark, tmp_dir)
            raise RuntimeError(f"snapshot compaction verification failed: {part_rel}")
        part_dir = (
            posixpath.join(table_root, part_rel) if part_rel else table_root
        )
        batch = uuid.uuid4().hex[:10]
        i = 0
        for st in fs.listStatus(Path(tmp_dir)):
            name = st.getPath().getName()
            if not name.endswith(".parquet"):
                continue
            dest_name = f"compacted-{batch}-{i:05d}.parquet"
            dest = Path(part_dir, dest_name)
            if not fs.rename(st.getPath(), dest):
                raise RuntimeError(f"rename failed: {name} -> {dest}")
            added.append(
                (
                    posixpath.join(part_rel, dest_name) if part_rel else dest_name,
                    int(fs.getFileStatus(dest).getLen()),
                )
            )
            i += 1
        _rm(spark, tmp_dir)
        rewritten += 1
    if not rewritten:
        return {"version": base_version, "rewritten": 0, "new_files": 0}
    version = log.commit(keep + added, op="compact", parent=base_version)
    return {"version": version, "rewritten": rewritten, "new_files": len(added)}


def sweep_orphans(
    spark: SparkSession,
    table_root: str,
    *,
    grace_seconds: float = 3600.0,
) -> dict:
    """Delete data files referenced by NO snapshot at all — the
    leftovers of commits that crashed between landing files and
    claiming a version. A grace period protects in-flight commits:
    a file younger than `grace_seconds` may belong to a commit that
    has not claimed its version yet, so it is kept. Bounded metadata
    work: one listing + the log's file sets."""
    log = SnapshotLog(spark, table_root)
    if not log.versions():
        return {"deleted_files": 0}
    referenced = {p for v in log.versions() for p, _ in log.files(v)}
    fs, _, jvm = _hadoop_fs(spark, table_root)
    Path = jvm.org.apache.hadoop.fs.Path
    now_ms = jvm.java.lang.System.currentTimeMillis()
    deleted = 0
    listing = list_partition_files(spark, table_root)
    for rel, files in listing.items():
        for uri, _ in files:
            relpath = posixpath.join(rel, posixpath.basename(uri)) if rel else (
                posixpath.basename(uri)
            )
            if relpath in referenced:
                continue
            p = Path(posixpath.join(table_root, relpath))
            age_s = (now_ms - fs.getFileStatus(p).getModificationTime()) / 1000.0
            if age_s < grace_seconds:
                continue  # possibly an in-flight commit
            if fs.delete(p, False):
                deleted += 1
    return {"deleted_files": deleted}


def expire_snapshots(
    spark: SparkSession, table_root: str, *, keep_last: int = 2
) -> dict:
    """Drop all but the newest `keep_last` snapshots and delete every
    data file referenced ONLY by the dropped ones — Iceberg's
    expire-snapshots contract. Files outside the log's knowledge
    (concurrent ingests not yet committed) are never touched."""
    log = SnapshotLog(spark, table_root)
    vs = log.versions()
    if len(vs) <= keep_last:
        return {"expired": 0, "deleted_files": 0}
    keep_vs, drop_vs = vs[-keep_last:], vs[:-keep_last]
    live = {p for v in keep_vs for p, _ in log.files(v)}
    dead = {
        p for v in drop_vs for p, _ in log.files(v) if p not in live
    }
    fs, _, jvm = _hadoop_fs(spark, table_root)
    Path = jvm.org.apache.hadoop.fs.Path
    deleted = 0
    for p in sorted(dead):
        if fs.delete(Path(posixpath.join(table_root, p)), False):
            deleted += 1
    for v in drop_vs:
        fs.delete(Path(log.log_dir, f"v{v:012d}.json"), False)
    return {"expired": len(drop_vs), "deleted_files": deleted}
