"""SQL mutation front door (sources/sql_router.py): statement
parsing, routing to the transactional helpers, pruning-dict
extraction, view refresh, and the refusal edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_compact_spark.compaction.snapshots import (
    SnapshotLog,
    annotate_stats,
    read_table_at,
    snapshot_delete,
    snapshot_update,
)
from hbase_compact_spark.sources.sql_router import (
    _parse_pred_dict,
    create_snapshot_view,
    snapshot_sql,
)


def test_pred_dict_parser_shapes():
    d, exact = _parse_pred_dict("k = 5 AND g = 'x'")
    assert d == {"k": 5, "g": "x"} and exact
    d, exact = _parse_pred_dict("k >= 10 AND k <= 20")
    assert d == {"k": (10, 20)} and exact
    d, exact = _parse_pred_dict("k BETWEEN 10 AND 20")
    assert d == {"k": (10, 20)} and exact
    # strict bounds prune inclusively but are not exact
    d, exact = _parse_pred_dict("k > 10")
    assert d == {"k": (10, None)} and not exact
    # multi-IN contributes range bounds, never exactness
    d, exact = _parse_pred_dict("k IN (3, 9, 5)")
    assert d == {"k": (3, 9)} and not exact
    d, exact = _parse_pred_dict("k IN (7)")
    assert d == {"k": 7} and exact
    # unparseable conjuncts drop out conservatively
    d, exact = _parse_pred_dict("k % 7 = 0 AND g = 'x'")
    assert d == {"g": "x"} and not exact
    # literal with quoted AND must not split
    d, exact = _parse_pred_dict("g = 'a AND b' AND k = 1")
    assert d == {"g": "a AND b", "k": 1} and exact
    assert _parse_pred_dict(None) == ({}, True)


@pytest.fixture()
def routed(spark, tmp_path):
    root = str(tmp_path / "routed")
    df = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    df.repartitionByRange(4, "k").write.parquet(root)
    SnapshotLog(spark, root).bootstrap()
    annotate_stats(spark, root, cols=["k"])
    create_snapshot_view(spark, "rt_t", root)
    return root


def test_routed_delete_prunes_and_matches(spark, routed):
    root = routed
    res = snapshot_sql(spark, "DELETE FROM rt_t WHERE k BETWEEN 150 AND 199")
    assert res["deleted_rows"] == 50
    # exact dict predicates -> candidate narrowing really pruned
    assert res["scanned_files"] < 4
    # the view auto-refreshed: next SELECT sees the new version
    assert snapshot_sql(spark, "SELECT * FROM rt_t").count() == 150


def test_routed_delete_arbitrary_condition(spark, routed):
    res = snapshot_sql(spark, "DELETE FROM rt_t WHERE k % 10 = 0 AND g = '0'")
    assert res["deleted_rows"] == 10  # k%10==0 -> k%4 of those ...
    t = read_table_at(spark, routed)
    assert t.filter("k % 10 = 0 AND g = '0'").count() == 0


def test_routed_update_simultaneous_assignment(spark, routed):
    # RHS must see ORIGINAL values: swap-like double reference
    res = snapshot_sql(
        spark, "UPDATE rt_t SET v = v + k, k = k + 1000 WHERE k >= 198"
    )
    assert res["updated_rows"] == 2
    t = read_table_at(spark, routed)
    rows = {r["k"]: r["v"] for r in t.filter("k >= 1000").collect()}
    assert rows == {1198: 198.0 * 2, 1199: 199.0 * 2}


def test_routed_merge_clause_matrix(spark, routed):
    spark.range(190, 210).select(
        F.col("id").alias("k"),
        F.lit("9").alias("g"),
        F.lit(-1.0).alias("v"),
    ).createOrReplaceTempView("rt_src")
    res = snapshot_sql(
        spark,
        """
        MERGE INTO rt_t t USING rt_src s ON t.k = s.k
        WHEN MATCHED AND t.g = '2' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.v, g = s.g
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    # matched 190-199: g='2' (k%4==2 -> 190, 194, 198) deleted,
    # 7 updated; 200-209 inserted
    assert res["deleted_matched"] == 3
    assert res["updated"] == 7
    assert res["inserted"] == 10
    t = read_table_at(spark, routed)
    assert t.count() == 200 - 3 + 10
    assert t.filter("v = -1.0").count() == 17


def test_routed_merge_not_matched_by_source(spark, routed):
    spark.range(0, 50).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("g"),
        F.lit(0.0).alias("v"),
    ).createOrReplaceTempView("rt_src2")
    res = snapshot_sql(
        spark,
        """
        MERGE INTO rt_t t USING rt_src2 s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED BY SOURCE AND k >= 180 THEN DELETE
        """,
    )
    assert res["updated"] == 50 and res["deleted_unmatched"] == 20
    t = read_table_at(spark, routed)
    assert t.count() == 180
    assert t.filter("k < 50 AND v != 0.0").count() == 0


def test_merge_clause_order_and_unsupported(spark, routed):
    spark.range(3).selectExpr(
        "id AS k", "'0' AS g", "0.0 AS v"
    ).createOrReplaceTempView("rt_src3")
    with pytest.raises(ValueError, match="DELETE clause first"):
        snapshot_sql(
            spark,
            """
            MERGE INTO rt_t t USING rt_src3 s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET v = s.v
            WHEN MATCHED AND t.g = '1' THEN DELETE
            """,
        )
    with pytest.raises(ValueError, match="equi-key"):
        snapshot_sql(
            spark,
            """
            MERGE INTO rt_t t USING rt_src3 s ON t.k >= s.k
            WHEN MATCHED THEN UPDATE SET v = s.v
            """,
        )
    with pytest.raises(ValueError, match="unsupported MERGE clause"):
        snapshot_sql(
            spark,
            """
            MERGE INTO rt_t t USING rt_src3 s ON t.k = s.k
            WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)
            """,
        )


def test_time_travel_views_are_read_only(spark, routed):
    create_snapshot_view(spark, "rt_v1", routed, version=1)
    assert snapshot_sql(spark, "SELECT * FROM rt_v1").count() == 200
    with pytest.raises(ValueError, match="read-only"):
        snapshot_sql(spark, "DELETE FROM rt_v1 WHERE k = 1")


def test_unregistered_tables_pass_through(spark, routed):
    spark.range(5).createOrReplaceTempView("plain_v")
    # DELETE on an unregistered name goes to spark.sql and fails
    # there (temp views are not deletable) — the router must not
    # swallow it
    with pytest.raises(Exception):
        snapshot_sql(spark, "DELETE FROM plain_v WHERE id = 1")
    assert snapshot_sql(spark, "SELECT count(*) AS n FROM plain_v").first()["n"] == 5


def test_update_refuses_partition_columns(spark, tmp_path):
    root = str(tmp_path / "pt")
    df = spark.range(40).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("region"),
    )
    df.write.partitionBy("region").parquet(root)
    SnapshotLog(spark, root).bootstrap()
    with pytest.raises(ValueError, match="partition column"):
        snapshot_update(spark, root, {"region": "'9'"})


def test_update_never_resurrects_mor_deleted_rows(spark, tmp_path):
    root = str(tmp_path / "mor")
    spark.range(100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v") \
        .repartitionByRange(2, "k").write.parquet(root)
    SnapshotLog(spark, root).bootstrap()
    snapshot_delete(spark, root, {"k": (0, 9)}, mode="mor")
    res = snapshot_update(spark, root, {"v": "v + 1"})
    assert res["updated_rows"] == 90
    t = read_table_at(spark, root)
    assert t.count() == 90 and t.filter("k < 10").count() == 0
