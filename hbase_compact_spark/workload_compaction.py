"""Compaction workload bindings — SURVEY.md §2 Part B
`bin_packing_plan` (the procedural planner; rows-only check — FFD is
not expressible in SQL) plus invariants exercised in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hbase_compact_spark.compaction.planner import plan_bins
from hbase_compact_spark.registry import query
from hbase_compact_spark.sources.inventory import derived_inventory

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
