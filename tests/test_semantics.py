"""Semantic-fidelity unit tests for the traps called out in SURVEY §7:
arg-max tie determinism, the >1-file HAVING boundary, and inventory
uniqueness."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_compact_spark.operators.relational import argmax_by, having
from hbase_compact_spark.sources.inventory import derived_inventory


def test_argmax_tie_breaks_to_largest_name(spark):
    """The reference keeps the FIRST max encountered in listing order
    (QHBaseCompact.java:157-160) — not a stable contract. Ours breaks
    ties to the LARGEST arg value, deterministically."""
    df = spark.createDataFrame(
        [("g", "a_file", 100), ("g", "z_file", 100), ("g", "m_file", 50)],
        "grp string, file string, size long",
    )
    out = argmax_by(df, ["grp"], "size", "file", alias="winner").collect()
    assert out[0]["winner"] == "z_file"
    assert out[0]["max_size"] == 100


def test_having_boundary_exactly_one_file(spark):
    """filenum == 1 must NOT pass the compactability gate; == 2 must
    (QHBaseCompact.java:151 strict `> 1`)."""
    df = spark.createDataFrame(
        [("solo", "f1", 10), ("pair", "f1", 10), ("pair", "f2", 20)],
        "grp string, file string, size long",
    )
    grouped = df.groupBy("grp").agg(F.count("*").alias("filenum"))
    out = {r["grp"] for r in having(grouped, F.col("filenum") > 1).collect()}
    assert out == {"pair"}


def test_inventory_file_names_unique_per_group(spark):
    inv = derived_inventory(spark, "/root/testdata/sf0.001")
    n = inv.count()
    assert (
        inv.select("table_name", "region", "family", "file").distinct().count() == n
    )


# ---------------------------------------------------- skew mitigation
def test_salted_join_equals_plain_join(spark):
    from hbase_compact_spark.operators.skew import salted_join
    from hbase_compact_spark.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_quantity", "l_partkey"
    )
    orders = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, ["l_orderkey"])
    salted = salted_join(li, orders, ["l_orderkey"], salt=4)
    assert salted.count() == plain.count()
    p = plain.agg(
        F.sum("l_quantity"), F.sum("o_totalprice"), F.sum("l_partkey")
    ).collect()[0]
    s = salted.agg(
        F.sum("l_quantity"), F.sum("o_totalprice"), F.sum("l_partkey")
    ).collect()[0]
    assert tuple(p) == tuple(s)
    assert sorted(salted.columns) == sorted(plain.columns)


def test_salted_join_left_outer_preserves_unmatched(spark):
    from hbase_compact_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    right = spark.createDataFrame([(1, 10.0), (1, 11.0)], "k int, w double")
    out = salted_join(left, right, ["k"], salt=3, how="left").collect()
    assert len(out) == 4  # k=1 matches twice, k=2/k=3 survive unmatched
    assert {r["k"] for r in out if r["w"] is None} == {2, 3}


def test_salted_groupby_agg_equals_plain(spark):
    from hbase_compact_spark.operators.skew import salted_groupby_agg
    from hbase_compact_spark.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem")
    plain = {
        r["l_returnflag"]: (r["n"], r["qty"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], r["qty"], r["mx"])
        for r in salted_groupby_agg(
            li,
            ["l_returnflag"],
            {"n": "count(*)", "qty": "sum(l_quantity)", "mx": "max(l_extendedprice)"},
            salt=8,
        ).collect()
    }
    assert plain == salted


def test_skew_salted_join_parity_no_broadcast_no_aqe(spark):
    """skew_salted_join's result must be identical to the PLAIN join
    even when the engine cannot rescue the skew itself: broadcast
    disabled (forces a genuine shuffle join, the regime salting is
    for) and AQE off (no runtime skew-split). This is the static
    salting recipe's correctness pin for the 90%-hot-key query."""
    from hbase_compact_spark.workload_olap import skew_salted_join
    from hbase_compact_spark.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        salted = skew_salted_join(spark, sf)
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan  # genuinely shuffled
        li = load_table(spark, sf, "lineitem").select(
            F.when(F.col("l_partkey") % 10 < 9, F.lit(-1))
            .otherwise(F.col("l_partkey"))
            .cast("long")
            .alias("k"),
            "l_quantity",
        )
        pt = load_table(spark, sf, "part")
        dim = (
            pt.filter(F.col("p_partkey") % 10 == 9)
            .select(F.col("p_partkey").cast("long").alias("k"), "p_type")
            .unionByName(
                spark.createDataFrame([(-1, "HOT")], "k long, p_type string")
            )
        )
        plain = (
            li.join(dim, "k")
            .groupBy("k", "p_type")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("l_quantity").alias("sum_qty"),
            )
        )
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
