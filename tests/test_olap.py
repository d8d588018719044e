"""Extended-OLAP behavior checks that the oracle can't express:
sketch accuracy bounds for the approximate aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

import hbase_compact_spark.workload_olap as olap
from hbase_compact_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_stats_within_tolerance(spark):
    approx = {r["l_returnflag"]: r for r in olap.approx_stats(spark, SF_DIR).collect()}
    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_orders"] - e["orders"]) / e["orders"] < 0.05
        assert abs(a["approx_median_price"] - e["median"]) / e["median"] < 0.05


def test_cube_lattice_consistency(spark):
    """CUBE totals must be internally consistent: the ALL/ALL cell
    equals the sum of the finest-grain cells."""
    out = olap.cube_stats(spark, SF_DIR).collect()
    fine = [r for r in out if r["region"] != "ALL" and r["family"] != "ALL"]
    total = [r for r in out if r["region"] == "ALL" and r["family"] == "ALL"]
    assert len(total) == 1
    assert total[0]["filenum"] == sum(r["filenum"] for r in fine)
    assert total[0]["total_bytes"] == sum(r["total_bytes"] for r in fine)
