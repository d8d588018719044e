"""Compaction workload bindings — SURVEY.md §2 Part B
`bin_packing_plan` (the procedural planner; rows-only check — FFD is
not expressible in SQL) and `snapshot_pruned_scan` (the snapshot log's
stats-based file pruning, oracle-twinned against a full-scan filter),
plus invariants exercised in tests.
"""

from __future__ import annotations

import hashlib
import os
import posixpath
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_compact_spark.compaction.planner import plan_bins
from hbase_compact_spark.registry import query
from hbase_compact_spark.sources.inventory import derived_inventory
from hbase_compact_spark.tables import load_table

# Fixture file sizes are floor(l_extendedprice*1000) ≈ 1-100 MB, so a
# 200 MB target packs a handful of "files" per bin — same shape as
# 128 MB parquet targets against real small files.
PLAN_TARGET_BYTES = 200_000_000


@query("bin_packing_plan")  # rows-only: greedy FFD is procedural
def bin_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit-decreasing bin assignment per (table, region,
    family) — the explicit form of the output-shape decision the
    reference delegates to the region server via majorCompact
    (QHBaseCompact.java:167), sized by its 40 s/GB cost intuition
    (:170). Deterministic; invariants checked in
    tests/test_compaction.py."""
    inv = derived_inventory(spark, sf_dir)
    return plan_bins(inv, PLAN_TARGET_BYTES)


# --------------------------------------------------------------------
# Shared builder scaffolding for the snapshot-log queries: each
# materializes a snapshot-logged copy of `orders` under the system
# temp dir (queries may not write beneath the read-only fixture
# tree), keyed by a fingerprint of the source parquet so a driver
# fixture regeneration rebuilds instead of serving stale rows.


def _memo_root(spark, sf_dir: str, tag: str, ready) -> tuple[str, object, bool]:
    """(root, log, is_ready) for a fingerprint-keyed materialization.
    One generation per (tag, source fingerprint) is kept: stale
    sibling directories from earlier fixture generations are removed
    so /tmp does not grow across driver rounds. `ready(log)` decides
    whether the existing materialization is complete."""
    import glob
    import shutil

    from hbase_compact_spark.compaction.snapshots import SnapshotLog

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    fp = hashlib.md5(
        f"{tag}:{src}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    base = posixpath.join(tempfile.gettempdir(), f"hcs_{tag}_{fp}")
    for stale in glob.glob(
        posixpath.join(tempfile.gettempdir(), f"hcs_{tag}_*")
    ):
        if stale != base:
            shutil.rmtree(stale, ignore_errors=True)
    root = posixpath.join(base, "orders")
    log = SnapshotLog(spark, root)
    try:
        ok = bool(ready(log))
    except FileNotFoundError:
        ok = False
    return root, log, ok


def _orders_slim(spark, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


# --------------------------------------------------------------------
# snapshot_pruned_scan — the snapshot log's data-skipping read path
# (Iceberg manifest-metrics move) as a driver-checkable query.
PRUNE_LO, PRUNE_HI = 1000, 2999
_SCAN_FILES = 8


def snapshot_scan_root(spark: SparkSession, sf_dir: str) -> str:
    """Materialize `orders` as a snapshot-logged table laid out for
    pruning: range-partitioned into ``_SCAN_FILES`` files on
    o_orderkey (disjoint per-file key ranges), then `annotate_stats`
    records each file's [min, max] in the snapshot."""
    from hbase_compact_spark.compaction.snapshots import annotate_stats

    root, log, ok = _memo_root(
        spark,
        sf_dir,
        "snap_scan",
        lambda lg: lg.latest() is not None and lg.stats(),
    )
    if ok:
        return root
    (
        _orders_slim(spark, sf_dir)
        .repartitionByRange(_SCAN_FILES, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(root)
    )
    annotate_stats(spark, root, cols=["o_orderkey"])
    return root


# --------------------------------------------------------------------
# snapshot_zorder_scan — the full table-format lifecycle as one query:
# many-small-files table -> z-order compaction -> stats annotation ->
# driver-side pruned read (Delta OPTIMIZE ZORDER BY + data skipping).
ZO_LO, ZO_HI = 100, 299  # o_custkey range predicate


def zorder_scan_root(spark: SparkSession, sf_dir: str) -> str:
    """Materialize `orders` as a snapshot-logged table that goes
    through the WHOLE lifecycle: 8 unordered hash-layout files
    (bootstrap v1) -> `annotate_stats` on the RAW layout (v2 — every
    file provably spans the key space, so pruning keeps everything;
    the honest before-picture) -> `snapshot_compact(cluster_by=
    [o_custkey, o_orderkey])` rewrites in Morton order and maintains
    the stats incrementally (v3 — per-file min/max now tight)."""
    from hbase_compact_spark.compaction.snapshots import (
        annotate_stats,
        snapshot_compact,
    )

    root, log, ok = _memo_root(
        spark,
        sf_dir,
        "zorder_scan",
        lambda lg: (lg.latest() or 0) >= 3 and lg.stats(),
    )
    if ok:
        return root
    # hash-partitioned = every file spans the full key space; only the
    # z-order rewrite makes per-file stats selective
    (
        _orders_slim(spark, sf_dir)
        .repartition(8, "o_orderkey")
        .write.mode("overwrite")
        .parquet(root)
    )
    log.bootstrap()
    annotate_stats(spark, root, cols=["o_custkey", "o_orderkey"])
    # 8 input files -> ~4 z-ordered outputs: fewer bins than files (so
    # compaction qualifies) but still several files, each covering a
    # compact z-range (so pruning has something to drop). The parent
    # snapshot carries stats, so the rewrite maintains them: new files
    # get a footer pass, no full re-annotation.
    total = sum(s for _, s in log.files())
    snapshot_compact(
        spark,
        root,
        target_bytes=max(1, total // 4),
        cluster_by=["o_custkey", "o_orderkey"],
    )
    return root


@query(
    "snapshot_zorder_scan",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_custkey BETWEEN {ZO_LO} AND {ZO_HI}
    """,
)
def snapshot_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range scan through z-order clustering + snapshot stats: before
    the compaction every file spans the whole custkey space (hash
    layout — nothing prunable); after the Morton rewrite each file
    covers a compact (custkey, orderkey) hyper-rectangle, so the
    driver drops the files whose custkey span provably misses the
    predicate before Spark plans anything. Pruning is conservative and
    the residual filter exact, so the result always equals full-scan +
    filter (the oracle). tests/test_snapshots.py asserts the z-ordered
    snapshot really prunes where the pre-compaction one cannot."""
    from hbase_compact_spark.compaction.snapshots import read_table_where

    root = zorder_scan_root(spark, sf_dir)
    return read_table_where(spark, root, {"o_custkey": (ZO_LO, ZO_HI)}).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


# --------------------------------------------------------------------
# snapshot_time_travel — read an EARLIER committed version while later
# appends exist (the Iceberg time-travel contract).
# v1 holds o_orderkey % TT_MOD != 0; v2 appends the rest — a modulo
# split is interior (both sides non-empty) at every scale factor
TT_MOD = 3


def time_travel_root(spark: SparkSession, sf_dir: str) -> str:
    """Materialize `orders` as a TWO-version snapshot table: v1 = the
    non-multiple-orderkey half (bootstrap), v2 = v1's files plus an
    appended directory holding the rest. Reading v1 must therefore see
    exactly the pre-append rows no matter what the directory now
    contains."""
    root, log, ok = _memo_root(
        spark, sf_dir, "time_travel", lambda lg: (lg.latest() or 0) >= 2
    )
    if ok:
        return root
    orders = _orders_slim(spark, sf_dir)
    (
        orders.filter(F.col("o_orderkey") % TT_MOD != 0)
        .repartition(2)
        .write.mode("overwrite")
        .parquet(root)
    )
    log.bootstrap()  # v1: only the pre-append files exist
    (
        orders.filter(F.col("o_orderkey") % TT_MOD == 0)
        .repartition(2)
        .write.mode("overwrite")
        .parquet(posixpath.join(root, "append2"))
    )
    log.commit_current(op="append", parent=1)  # v2: everything on disk
    return root


@query(
    "snapshot_time_travel",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey % {TT_MOD} <> 0
    """,
)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel through the snapshot log
    (compaction/snapshots.py:read_table_at): the query reads VERSION 1
    of a table that has since received an append commit, and must
    return exactly the pre-append rows — uncommitted or
    later-committed files are invisible by construction because a
    snapshot is a complete file-set listing, never a directory scan.
    The oracle is the equivalent filter over the source table."""
    from hbase_compact_spark.compaction.snapshots import read_table_at

    root = time_travel_root(spark, sf_dir)
    return read_table_at(spark, root, version=1).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "snapshot_pruned_scan",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey BETWEEN {PRUNE_LO} AND {PRUNE_HI}
    """,
)
def snapshot_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range scan through the snapshot log's driver-side file pruning
    (compaction/snapshots.py:read_table_where): per-file o_orderkey
    [min, max] stats drop provably-disjoint files from the scan list
    BEFORE Spark plans anything, then the exact filter runs on the
    survivors — so the result always equals full-scan + filter (the
    oracle). At 100 TB this is the difference between listing 7/8 of
    the files out of the query and reading them: pruning cost is
    O(files) driver metadata, no filesystem access.
    tests/test_snapshots.py asserts the plan really prunes."""
    from hbase_compact_spark.compaction.snapshots import read_table_where

    root = snapshot_scan_root(spark, sf_dir)
    return read_table_where(
        spark, root, {"o_orderkey": (PRUNE_LO, PRUNE_HI)}
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
