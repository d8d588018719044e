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
# snapshot_pruned_scan — the snapshot log's data-skipping read path
# (Iceberg manifest-metrics move) as a driver-checkable query.
PRUNE_LO, PRUNE_HI = 1000, 2999
_SCAN_FILES = 8


def snapshot_scan_root(spark: SparkSession, sf_dir: str) -> str:
    """Materialize `orders` as a snapshot-logged table laid out for
    pruning: range-partitioned into ``_SCAN_FILES`` files on
    o_orderkey (disjoint per-file key ranges), then `annotate_stats`
    records each file's [min, max] in the snapshot. Built once per
    fixture generation — the cache key fingerprints the source
    parquet's (path, mtime, size), so a driver fixture regeneration
    rebuilds instead of serving stale rows. Lives in the system temp
    dir: queries may not write under the read-only fixture tree."""
    from hbase_compact_spark.compaction.snapshots import (
        SnapshotLog,
        annotate_stats,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    fp = hashlib.md5(
        f"{src}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    root = posixpath.join(
        tempfile.gettempdir(), f"hcs_snap_scan_{fp}", "orders"
    )
    log = SnapshotLog(spark, root)
    v = log.latest()
    if v is not None and log.stats(v):
        return root
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .repartitionByRange(_SCAN_FILES, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(root)
    )
    annotate_stats(spark, root, cols=["o_orderkey"])
    return root


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
