"""functions/ranking.py — the scalable global-rank primitive.

Equality pins: the two-phase range-partitioned row_number (and the
ntile / percent_rank / cume_dist expressions derived from it) must be
BIT-IDENTICAL to Spark's own single-partition window functions on the
same total ordering — every size edge (empty, 1 row, fewer rows than
partitions, n % k != 0) and a DESC ordering included.

Plan pins: the data-scaled window must be partitioned by the range
bucket (__gr_pid); the only unpartitioned window / SinglePartition
exchange allowed is the one over the per-partition counts frame
(<= shuffle partitions — bounded by cluster config, not data).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from hbase_compact_spark.functions.ranking import (
    cume_dist_expr,
    ntile_expr,
    percent_rank_expr,
    with_global_row_number,
)

SF_DIR = "/root/testdata/sf0.01"
_Q = entrymod.queries()


def _toy(spark, n: int, seed_mod: int = 7):
    # ties in the first key (k = i % seed_mod), unique tie-break on i
    rows = [(i % seed_mod, i, f"v{i}") for i in range(n)]
    return spark.createDataFrame(rows, "k long, i long, payload string")


@pytest.mark.parametrize("n", [0, 1, 3, 31, 32, 33, 257])
def test_global_row_number_matches_naive_window(spark, n):
    df = _toy(spark, n)
    order = [F.asc("k"), F.desc("i")]
    got = with_global_row_number(df, order, name="rn").select("i", "rn")
    want = df.select(
        "i", F.row_number().over(Window.orderBy(*order)).alias("rn")
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_global_row_number_fewer_rows_than_partitions(spark):
    df = _toy(spark, 5)
    got = with_global_row_number(
        df, ["k", "i"], name="rn", count_name="n", num_partitions=64
    )
    rows = {r["i"]: (r["rn"], r["n"]) for r in got.collect()}
    assert sorted(rn for rn, _ in rows.values()) == [1, 2, 3, 4, 5]
    assert all(n == 5 for _, n in rows.values())


@pytest.mark.parametrize("k", [1, 2, 3, 4, 7, 40])
def test_derived_exprs_match_window_functions(spark, k):
    # one frame with every n in 1..25 as its own ordering partition:
    # compares my closed-form ntile/percent_rank/cume_dist against
    # Spark's window functions across all n % k residues at once
    rows = [(n, i) for n in range(1, 26) for i in range(1, n + 1)]
    df = spark.createDataFrame(rows, "n long, rn long")
    w = Window.partitionBy("n").orderBy("rn")
    got = df.select(
        "n",
        "rn",
        ntile_expr(F.col("rn"), F.col("n"), k).cast("long").alias("nt"),
        percent_rank_expr(F.col("rn"), F.col("n")).alias("pr"),
        cume_dist_expr(F.col("rn"), F.col("n")).alias("cd"),
    )
    want = df.select(
        "n",
        "rn",
        F.ntile(k).over(w).cast("long").alias("nt"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    assert sorted(got.collect()) == sorted(want.collect())


@pytest.mark.parametrize("n", [0, 1, 17, 400])
def test_grouped_row_number_matches_naive_window(spark, n):
    # heavily skewed groups: g=0 holds ~70% of rows — the case where
    # Window.partitionBy(g) would single-task the big stratum
    rows = [(0 if i % 10 < 7 else i % 10, i) for i in range(n)]
    df = spark.createDataFrame(rows, "g long, i long")
    from hbase_compact_spark.functions.ranking import (
        with_grouped_row_number,
    )

    got = with_grouped_row_number(df, ["g"], [F.desc("i")], name="rn")
    want = df.select(
        "g",
        "i",
        F.row_number()
        .over(Window.partitionBy("g").orderBy(F.desc("i")))
        .alias("rn"),
    )
    assert sorted(got.select("g", "i", "rn").collect()) == sorted(
        want.collect()
    )


def _executed(spark, name: str) -> str:
    df = _Q[name](spark, SF_DIR)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    ["window_ntile", "rank_fusion", "corpus_shuffle", "stratified_sample"],
)
def test_no_data_scaled_single_partition_window(spark, name):
    """These queries rank frames whose cardinality grows with the data
    (customers / documents): every row_number window in the executed
    plan must be partitioned by the range bucket, and no unpartitioned
    window may run over anything but the tiny counts frame.
    stratified_sample additionally must never hash a whole stratum
    onto one task — its rank window partitions on (bucket, lang)."""
    p = _executed(spark, name)
    for line in p.splitlines():
        if "row_number() windowspecdefinition(" not in line:
            continue
        assert "__gr_pid" in line, f"{name}: unpartitioned rank window: {line}"
    # the offsets running sum is the only unpartitioned window and it
    # consumes __gr_cnt (<= shuffle-partition rows)
    for line in p.splitlines():
        if "Window [" in line and "__gr_pid" not in line:
            assert "__gr_cnt" in line, f"{name}: stray global window: {line}"


def test_window_ntile_still_two_pass_shape(spark):
    """The ranked input is checkpointed once (Scan ExistingRDD) and the
    offsets come back as a broadcast, never a sort-merge join."""
    p = _executed(spark, "window_ntile")
    assert "Scan ExistingRDD" in p
    assert "SortMergeJoin" not in p


def test_grouped_row_number_accepts_column_group_keys(spark):
    """Regression: a Column-EXPRESSION group key used to range-
    partition on the expression but groupBy/join on a derived display
    name ('(g % 3)') that base never carried -> UNRESOLVED_COLUMN.
    Expressions are now materialized as synthetic columns for the
    pipeline and dropped from the result."""
    from hbase_compact_spark.functions.ranking import (
        with_grouped_row_number,
    )

    df = spark.createDataFrame(
        [(i % 7, i) for i in range(100)], "g long, i long"
    )
    got = with_grouped_row_number(
        df, [F.col("g") % 3], [F.desc("i")], name="rn"
    )
    assert set(got.columns) == {"g", "i", "rn"}
    want = df.select(
        "g",
        "i",
        F.row_number()
        .over(Window.partitionBy(F.col("g") % 3).orderBy(F.desc("i")))
        .cast("long")
        .alias("rn"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
