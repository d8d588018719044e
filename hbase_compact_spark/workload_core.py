"""Core relational workload — SURVEY.md §2 Part B, rows
`scan_project` .. `compaction_candidates`.

Each query generalizes a concrete behavior of the reference
(QHC.java = /root/reference/src/main/java/com/qunar/dba/
QHBaseCompact.java); citations inline. The DuckDB oracle twin sits
next to each query so the two dialects stay in sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_compact_spark.operators.relational import (
    argmax_by,
    group_stats,
    having,
    rollup_with_total,
    running_window,
    snapshot_diff,
    time_of_day_gate,
    topk,
)
from hbase_compact_spark.registry import query
from hbase_compact_spark.sources.inventory import INVENTORY_SQL, derived_inventory
from hbase_compact_spark.tables import load_table

# Documented-but-dead thresholds of the reference (QHC.java:32-33,
# 97-98 parse them; nothing reads them — README.md:23-24 documents the
# intent). We implement the documented semantics, scaled to fixture
# sizes: stores below `direct` compact directly; stores above `major`
# are skipped as too large.
DIRECT_COMPACT_SIZE = 300_000_000
MAJOR_FILE_SIZE = 600_000_000


# --------------------------------------------------------------------
# scan_project — source scan + projection + scalar exprs (A8/A9/A14:
# QHC.java:147-149 path building, :166 GB conversion). Projection and
# the shipdate filter push down to the parquet scan.
@query(
    "scan_project",
    oracle=f"""
    WITH inventory AS ({INVENTORY_SQL})
    SELECT region, family, file,
           size_bytes,
           size_bytes / (1024.0*1024.0*1024.0) AS size_gb
    FROM inventory
    """,
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    # size_gb unrounded: integer / 2^30 is EXACT in binary (identical
    # doubles both engines), whereas round(..., 9) hits a half-tie
    # whenever the size is odd*2^21 (terminating decimal expansion
    # ending in 5 at digit 10) and Spark/DuckDB break ties differently
    inv = derived_inventory(spark, sf_dir)
    return inv.select(
        "region",
        "family",
        "file",
        "size_bytes",
        (F.col("size_bytes") / (1024.0 * 1024.0 * 1024.0)).alias("size_gb"),
    )


# --------------------------------------------------------------------
# filter_pred — comparison / BETWEEN / IN / LIKE / AND-OR predicates
# (A3 gate compare QHC.java:52, A10 filter :151, generalized).
@query(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_day
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND (l_discount < 0.05 OR l_tax > 0.03)
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= "1997-01-01")
        & ((F.col("l_discount") < 0.05) | (F.col("l_tax") > 0.03))
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_returnflag",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
    )


# --------------------------------------------------------------------
# groupby_stats — the flagship: per-group COUNT/SUM/AVG/MIN/MAX, the
# Spark analog of getTableDetails (QHC.java:219-270) in TPC-H-Q1 shape.
# One fused hash aggregate (partial + final), exactly as Catalyst
# plans multiple aggregates over the same keys.
@query(
    "groupby_stats",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS filenum,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6)))
                AS DOUBLE) AS sum_revenue,
           avg(l_quantity) AS avg_qty,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("filenum"),
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(20,6)"
            )
        )
        .cast("double")
        .alias("sum_revenue"),
        # unrounded: integral-valued doubles sum exactly, so the
        # avg division is bit-identical cross-engine (round() would
        # diverge on exact decimal ties; see window_rank_dist)
        F.avg("l_quantity").alias("avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


# --------------------------------------------------------------------
# argmax_group — largest file's NAME per (region, family)
# (QHC.java:157-160; poll-side re-eval :174-181). Single-pass max_by
# in Spark; the oracle uses a window because DuckDB's arg_max cannot
# take a composite ordering. Ties break to the largest file name.
@query(
    "argmax_group",
    oracle=f"""
    WITH inventory AS ({INVENTORY_SQL}),
    ranked AS (
      SELECT region, family, file, size_bytes,
             row_number() OVER (PARTITION BY region, family
                                ORDER BY size_bytes DESC, file DESC) AS rn
      FROM inventory
    )
    SELECT region, family, size_bytes AS max_size_bytes, file AS max_file
    FROM ranked WHERE rn = 1
    """,
)
def argmax_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    inv = derived_inventory(spark, sf_dir)
    out = argmax_by(inv, ["region", "family"], "size_bytes", "file", alias="max_file")
    return out.select(
        "region",
        "family",
        F.col("max_size_bytes"),
        "max_file",
    )


# --------------------------------------------------------------------
# having_filter — post-aggregation gate: only groups with more than
# one file are compactable (QHC.java:151; single-file stores are
# skipped at :186-190).
@query(
    "having_filter",
    oracle=f"""
    WITH inventory AS ({INVENTORY_SQL})
    SELECT region, family, count(*) AS filenum,
           CAST(sum(size_bytes) AS BIGINT) AS total_bytes
    FROM inventory
    GROUP BY region, family
    HAVING count(*) > 120
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    inv = derived_inventory(spark, sf_dir)
    grouped = inv.groupBy("region", "family").agg(
        F.count("*").alias("filenum"),
        F.sum("size_bytes").alias("total_bytes"),
    )
    return having(grouped, F.col("filenum") > 120)


# --------------------------------------------------------------------
# rollup_total — per-group sums + grand total in one query — the
# tableSize rollup of QHC.java:237,248,255 done properly with ROLLUP.
@query(
    "rollup_total",
    oracle=f"""
    WITH inventory AS ({INVENTORY_SQL})
    SELECT CASE WHEN GROUPING(region) = 1 THEN 'ALL' ELSE region END
             AS region,
           CASE WHEN GROUPING(family) = 1 THEN 'ALL' ELSE family END
             AS family,
           count(*) AS filenum,
           CAST(sum(size_bytes) AS BIGINT) AS total_bytes
    FROM inventory
    GROUP BY ROLLUP (region, family)
    """,
)
def rollup_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    inv = derived_inventory(spark, sf_dir)
    return rollup_with_total(inv, ["region", "family"], "size_bytes").select(
        "region", "family", "filenum", "total_bytes"
    )


# --------------------------------------------------------------------
# time_window_gate — rows whose time-of-day falls inside the
# compaction window (QHC.java:48-60; example window 08:30-12:30 from
# conf/config.properties:5-6).
@query(
    "time_window_gate",
    oracle="""
    SELECT event_id, user_id, event_type,
           strftime(ts, '%H:%M:%S') AS tod
    FROM events
    WHERE strftime(ts, '%H:%M:%S') BETWEEN '08:30:00' AND '12:30:00'
    """,
)
def time_window_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    gated = time_of_day_gate(ev, "ts", "08:30:00", "12:30:00")
    return gated.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "HH:mm:ss").alias("tod"),
    )


# --------------------------------------------------------------------
# topk_order_limit — ORDER BY ... LIMIT k (generalizes the top-1
# arg-max A13). Unique tie-break key ⇒ deterministic set. Catalyst
# plans TakeOrderedAndProject (no global sort).
@query(
    "topk_order_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC
    LIMIT 25
    """,
)
def topk_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return topk(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        [
            F.desc("l_extendedprice"),
            F.desc("l_orderkey"),
            F.desc("l_linenumber"),
        ],
        25,
    )


# --------------------------------------------------------------------
# join_equi — star join: revenue per nation (generalizes the region x
# family nested loop A7 into real dimension joins). Dimensions are
# broadcast (customer/nation are tiny next to lineitem/orders) so the
# only shuffle is the lineitem->orders join + final aggregation; at
# 100 TB, AQE would also pick broadcast automatically from size stats.
@query(
    "join_equi",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20,6)))
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # only nation gets a HARD broadcast hint (bounded: 25 rows at any
    # scale factor); customer is left to AQE's size-based decision —
    # it broadcasts at fixture scale but is a multi-TB table at
    # SF~100000, where an unconditional hint would OOM the broadcast
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(20,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# --------------------------------------------------------------------
# join_semi_anti — semi + anti join in one result: which customers
# have orders and which do not (the reference's resume semantics —
# regions before the checkpoint index are "done", the rest pending,
# QHC.java:133,193 — generalized to set membership).
@query(
    "join_semi_anti",
    oracle="""
    SELECT c_custkey, c_name, 'has_orders' AS status
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, c_name, 'no_orders' AS status
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    semi = (
        cust.join(orders, "c_custkey", "left_semi")
        .select("c_custkey", "c_name")
        .withColumn("status", F.lit("has_orders"))
    )
    anti = (
        cust.join(orders, "c_custkey", "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("status", F.lit("no_orders"))
    )
    return semi.unionAll(anti)


# --------------------------------------------------------------------
# cross_product — small-dimension cross join (the region x family
# nested loop, QHC.java:144-146,239-241). Both sides tiny ⇒ Spark
# plans BroadcastNestedLoopJoin; never do this with two large inputs.
@query(
    "cross_product",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def cross_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_name")
    statuses = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(statuses)


# --------------------------------------------------------------------
# window_running — running totals / rank over ordered partitions
# (generalizes the positional region cursor A6, QHC.java:133-146).
# Exact DECIMAL accumulation so the running sums hash identically.
@query(
    "window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "price_dec", F.col("o_totalprice").cast("decimal(18,2)")
    )
    out = running_window(orders, ["o_custkey"], ["o_orderdate", "o_orderkey"], "price_dec")
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.col("rn").cast("long").alias("rn"),
        F.col("running_total").cast("double").alias("running_total"),
    )


# --------------------------------------------------------------------
# set_ops — UNION / INTERSECT / EXCEPT of listings (snapshot algebra,
# A17). Customers ordering in both 'O' and 'F' status, minus any with
# a 'P' order.
@query(
    "set_ops",
    oracle="""
    (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
     INTERSECT
     SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return o.intersect(f).exceptAll(p.distinct())


# --------------------------------------------------------------------
# snapshot_diff — groups whose largest-file NAME changed between two
# listing snapshots: the batch form of quickPoll's completion
# predicate (QHC.java:171-184). Snapshot t0 = files shipped before
# 1998-01-01; t1 = everything.
@query(
    "snapshot_diff",
    oracle=f"""
    WITH inventory AS ({INVENTORY_SQL}),
    s0 AS (SELECT * FROM inventory WHERE mtime < TIMESTAMP '1998-01-01'),
    r0 AS (
      SELECT region, family, file,
             row_number() OVER (PARTITION BY region, family
                                ORDER BY size_bytes DESC, file DESC) AS rn
      FROM s0
    ),
    r1 AS (
      SELECT region, family, file,
             row_number() OVER (PARTITION BY region, family
                                ORDER BY size_bytes DESC, file DESC) AS rn
      FROM inventory
    )
    SELECT r0.region, r0.family,
           r0.file AS file_before, r1.file AS file_after
    FROM r0 JOIN r1 ON r0.region = r1.region AND r0.family = r1.family
    WHERE r0.rn = 1 AND r1.rn = 1 AND r0.file <> r1.file
    """,
)
def snapshot_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both snapshots derive from one inventory: checkpoint it so the
    # scan+groupBy pipeline runs once, not once per snapshot side
    inv = derived_inventory(spark, sf_dir).localCheckpoint(eager=False)
    snap0 = inv.filter(F.col("mtime") < "1998-01-01")
    return snapshot_diff(snap0, inv, ["region", "family"], "size_bytes", "file")


# --------------------------------------------------------------------
# compaction_candidates — the reference's DOCUMENTED selection
# semantics, including the thresholds it parses but never uses
# (QHC.java:32-33,97-98 dead; README.md:23-24 documents intent):
# compact stores with >1 file; 'direct' when total below
# directcompactsize, 'skip_too_large' above marjorfilesize.
@query(
    "compaction_candidates",
    oracle=f"""
    WITH inventory AS ({INVENTORY_SQL}),
    g AS (
      SELECT region, family, count(*) AS filenum,
             CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
             max(size_bytes) AS max_bytes
      FROM inventory
      GROUP BY region, family
    )
    SELECT region, family, filenum, total_bytes,
           CASE
             WHEN total_bytes > {MAJOR_FILE_SIZE} THEN 'skip_too_large'
             WHEN total_bytes < {DIRECT_COMPACT_SIZE} THEN 'direct'
             ELSE 'scheduled'
           END AS decision
    FROM g
    WHERE filenum > 1
    """,
)
def compaction_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    inv = derived_inventory(spark, sf_dir)
    g = group_stats(inv, ["region", "family"], "size_bytes")
    return (
        having(g, F.col("filenum") > 1)
        .withColumn(
            "decision",
            F.when(F.col("total_bytes") > MAJOR_FILE_SIZE, "skip_too_large")
            .when(F.col("total_bytes") < DIRECT_COMPACT_SIZE, "direct")
            .otherwise("scheduled"),
        )
        .select("region", "family", "filenum", "total_bytes", "decision")
    )


# --------------------------------------------------------------------
# scalar_funcs — the string/date/math scalar library (A8 path concat
# QHC.java:147-148, A14 GB conversion :166, A16 cost model :170).
@query(
    "scalar_funcs",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderstatus) AS status_u,
           concat_ws('-', o_orderpriority, o_orderstatus) AS pri_status,
           substr(o_orderpriority, 1, 1) AS pri_code,
           strftime(o_orderdate, '%Y-%m') AS order_month,
           round(sqrt(o_totalprice), 4) AS sqrt_price,
           round(pow(o_totalprice / 1000.0, 2.0), 4) AS sq_kprice,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT)
               AS days_to_2002,
           length(o_orderpriority) AS pri_len
    FROM orders
    """,
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_u"),
        F.concat_ws("-", "o_orderpriority", "o_orderstatus").alias("pri_status"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.round(F.sqrt("o_totalprice"), 4).alias("sqrt_price"),
        F.round(F.pow(F.col("o_totalprice") / 1000.0, 2.0), 4).alias("sq_kprice"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_2002"),
        F.length("o_orderpriority").cast("long").alias("pri_len"),
    )


# --------------------------------------------------------------------
# point_lookup / range_scan — the HBase Get/Scan access patterns over
# the engine's sorted-key world view. The reference never reads cell
# data (admin + fs metadata only), but its domain is a kv-store: these
# are the data-path analogs, served by parquet min/max pushdown
# (point/range predicates prune row groups the way a key-ordered HFile
# scan seeks).
@query(
    "point_lookup",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_orderkey = 1024
    """,
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") == 1024).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@query(
    "range_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem
    WHERE l_orderkey BETWEEN 500 AND 600
    """,
)
def range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey").between(500, 600)).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )


# --------------------------------------------------------------------
# json_funcs — JSON extraction over the events.props column (engine
# extension; the reference's config record A1 is the closest analog of
# semi-structured input).
@query(
    "json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


# --------------------------------------------------------------------
# format_roundtrip — the multi-format source/sink layer under the
# driver's hash check: the SAME aggregate over CSV / JSON-lines /
# ORC / Parquet materializations of one table must be IDENTICAL, so
# any type-fidelity loss in a format codec (timestamp precision,
# double round-trip, NULL-vs-empty-string) breaks the oracle compare.
@query(
    "format_roundtrip",
    oracle="""
    SELECT fmt, n_rows, n_statuses, total_price, max_day FROM (
      SELECT 'csv' AS fmt, count(*) AS n_rows,
             count(DISTINCT o_orderstatus) AS n_statuses,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
             strftime(max(o_orderdate), '%Y-%m-%d') AS max_day
      FROM orders
      UNION ALL
      SELECT 'json', count(*), count(DISTINCT o_orderstatus),
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
             strftime(max(o_orderdate), '%Y-%m-%d')
      FROM orders
      UNION ALL
      SELECT 'orc', count(*), count(DISTINCT o_orderstatus),
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
             strftime(max(o_orderdate), '%Y-%m-%d')
      FROM orders
      UNION ALL
      SELECT 'parquet', count(*), count(DISTINCT o_orderstatus),
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
             strftime(max(o_orderdate), '%Y-%m-%d')
      FROM orders
    )
    """,
)
def format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the orders table back from CSV, JSON-lines, ORC and
    Parquet materializations (sources/formats.py — schema-applied
    reads, explicit text timestamp format) and aggregate each; the
    four result rows must carry bit-identical values. Doubles survive
    the text formats because Spark writes the shortest repr that
    parses back to the same IEEE value; timestamps carry an explicit
    micros format. The materialization is fingerprint-keyed in /tmp
    and rebuilt when the fixture changes."""
    from functools import reduce

    from hbase_compact_spark.sources.formats import (
        FORMATS,
        materialized_formats_root,
        read_table,
    )

    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    root = materialized_formats_root(spark, sf_dir, src, "formats")
    parts = []
    for fmt in FORMATS:
        df = read_table(spark, f"{root}/{fmt}", fmt, src.schema)
        parts.append(
            df.agg(
                F.count("*").alias("n_rows"),
                F.countDistinct("o_orderstatus").alias("n_statuses"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_price"),
                F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias(
                    "max_day"
                ),
            ).select(F.lit(fmt).alias("fmt"), "*")
        )
    return reduce(lambda a, b: a.unionByName(b), parts)
