"""Property-based oracle-differential fuzzing: hypothesis generates
random predicate/aggregation shapes, both engines run them, results
must hash-match. This covers the expression-semantics surface (null
handling, comparison edges, grouping) far beyond the 44 fixed
queries."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hbase_compact_spark.tables import load_table
from tests.oracle_utils import assert_matches_oracle

SF_DIR = "/root/testdata/sf0.001"

NUM_COLS = ["l_quantity", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
FLAGS = ["A", "N", "R"]
STATUSES = ["F", "O"]


comparison = st.sampled_from(["<", "<=", ">", ">=", "=", "<>"])
num_col = st.sampled_from(NUM_COLS)
bounds = {
    "l_quantity": st.integers(min_value=0, max_value=51),
    "l_discount": st.decimals(
        min_value=0, max_value=0.11, places=2
    ).map(str),
    "l_tax": st.decimals(min_value=0, max_value=0.09, places=2).map(str),
}


@st.composite
def predicate(draw):
    kind = draw(st.sampled_from(["cmp", "between", "in", "null_safe"]))
    if kind == "cmp":
        c = draw(num_col)
        return f"{c} {draw(comparison)} {draw(bounds[c])}"
    if kind == "between":
        c = draw(num_col)
        lo, hi = draw(bounds[c]), draw(bounds[c])
        return f"{c} BETWEEN {min(lo, hi, key=float)} AND {max(lo, hi, key=float)}"
    if kind == "in":
        vals = draw(
            st.lists(st.sampled_from(FLAGS), min_size=1, max_size=3, unique=True)
        )
        return "l_returnflag IN (" + ", ".join(f"'{v}'" for v in vals) + ")"
    return "l_extendedprice IS NOT NULL"


@st.composite
def where_clause(draw):
    preds = draw(st.lists(predicate(), min_size=1, max_size=3))
    glue = draw(st.sampled_from([" AND ", " OR "]))
    return glue.join(f"({p})" for p in preds)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(where=where_clause(), group=st.sampled_from(STR_COLS + [None]))
def test_fuzz_filter_aggregate(spark, where, group):
    li = load_table(spark, SF_DIR, "lineitem")
    filtered = li.filter(F.expr(where))
    if group is None:
        sdf = filtered.agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
        sql = f"""
            SELECT count(*) AS n, sum(l_quantity) AS sum_qty,
                   min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
            FROM lineitem WHERE {where}
        """
    else:
        sdf = filtered.groupBy(group).agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
        )
        sql = f"""
            SELECT {group}, count(*) AS n, sum(l_quantity) AS sum_qty
            FROM lineitem WHERE {where} GROUP BY {group}
        """
    assert_matches_oracle(sdf, sql, SF_DIR)
