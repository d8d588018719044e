"""Scalable global ranking: row_number / ntile / percent_rank /
cume_dist without a single-partition window.

A bare ``Window.orderBy(...)`` (no PARTITION BY) moves the ENTIRE
input through one task — Spark itself warns ("No Partition Defined
for Window operation ... serious performance degradation"). That is
the same scale-ceiling class as a forced broadcast on a growing
frame: fine at 60k rows, dead at 10^9 (a 100 TB corpus has ~1e9
customers / documents; 24 B/row is a 24 GB single task).

These helpers compute the identical answer with a two-phase
distributed plan:

1. ``repartitionByRange`` on the sort keys — a distributed sort where
   partition *i* holds keys ordered strictly before partition *i+1*
   (range partitioning respects DESC sort orders, so ascending
   partition id == requested global order);
2. per-partition local ``row_number`` plus a tiny per-partition count
   frame (<= shuffle-partition rows, bounded by cluster config, not
   data) whose running sum gives each partition's global offset;
3. broadcast the offsets back and add.

The repartitioned frame is ``localCheckpoint(eager=False)``'d before
the lineage fans into the count and rank branches. This is
correctness, not caching: Spark's range exchange SAMPLES the input to
choose partition bounds with a per-RDD seed, so two independent
executions of the same ``repartitionByRange`` can pick DIFFERENT
boundaries. Without the checkpoint barrier, the offsets branch could
run against one partitioning and the rank branch against another,
silently corrupting every rank downstream of the mismatch (exchange
reuse would usually dedup the two subtrees, but column pruning makes
them non-identical, so reuse is not guaranteed). Same barrier recipe
as functions/similarity.py's shingle index.

The ordering passed in MUST be total (tie-break on a unique key).
Ties straddling a range boundary would make ``row_number``
nondeterministic — exactly as they already are under a
single-partition window, so this adds no new requirement; it just
refuses to hide it.

Derived statistics under a total ordering (no peer groups):
``rank == row_number``, so ``percent_rank = (rn-1)/(n-1)`` and
``cume_dist = rn/n`` — the same double-precision expressions Spark's
own window functions evaluate, hence bit-identical results. ``ntile``
uses the standard SQL bucket rule (first ``n mod k`` buckets get one
extra row), pinned against Spark's ``F.ntile`` in tests.

Reference: QHC.java:237-255 (the global rollup) is the reference's
only whole-table ordering moment; these helpers serve the engine's
wider OLAP surface (window_ntile, rank_fusion) at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gr_pid"
_LRN = "__gr_lrn"
_OFF = "__gr_off"
_CNT = "__gr_cnt"


def _order_cols(order) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order]


def with_global_row_number(
    df: DataFrame,
    order,
    name: str = "rn",
    *,
    count_name: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global ``row_number`` column ``name`` under the
    total ordering ``order`` (strings or Column sort expressions,
    e.g. ``[F.desc("score"), "doc_id"]``) without ever collapsing the
    data to one task. If ``count_name`` is given, also add the total
    row count as a column (scalar broadcast join — the legitimate
    1-row use of a broadcast hint)."""
    spark = df.sparkSession
    if num_partitions is None:
        try:
            num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except ValueError:  # "auto" under some AQE configs
            num_partitions = 200
    cols = _order_cols(order)
    base = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = base.groupBy(_PID).agg(F.count("*").alias(_CNT))
    # Running-sum window over <= num_partitions rows: global by
    # construction, but bounded by cluster config — not a data-scaled
    # single-partition window. Partitioning on a constant keeps the
    # identical single-group semantics while making the boundedness
    # explicit to Spark (an EMPTY partitionSpec triggers WindowExec's
    # "no partition defined ... serious performance degradation"
    # warning unconditionally, which would mislabel this bounded
    # frame as a scale hazard on every bench run).
    offsets = counts.select(
        _PID,
        F.coalesce(
            F.sum(_CNT).over(
                Window.partitionBy(F.lit(0))
                .orderBy(_PID)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias(_OFF),
    )
    out = (
        base.withColumn(
            _LRN, F.row_number().over(Window.partitionBy(_PID).orderBy(*cols))
        )
        .join(F.broadcast(offsets), _PID)
        .withColumn(name, (F.col(_LRN) + F.col(_OFF)).cast("long"))
        .drop(_PID, _LRN, _OFF)
    )
    if count_name is not None:
        total = counts.agg(F.sum(_CNT).cast("long").alias(count_name))
        out = out.crossJoin(F.broadcast(total))
    return out


def with_grouped_row_number(
    df: DataFrame,
    group,
    order,
    name: str = "rn",
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group 1-based row_number under a total within-group
    ordering, for FEW, HUGE groups (strata). A plain
    ``Window.partitionBy(group)`` hashes each group onto ONE task — a
    5-language corpus puts ~44% of 100 TB through a single executor.
    Here the range partition runs on (group, order) together, so a
    skewed group SPLITS across many contiguous partitions; offsets are
    per (partition, group) — at most ``num_partitions + n_groups``
    rows (ranges are contiguous, so a partition holds at most one
    group boundary), broadcast back like the global variant.

    Use the plain partitioned window instead when groups are MANY and
    small (per-doc, per-user): there the hash partition spreads fine
    and the offsets frame here would grow past broadcast size.
    """
    spark = df.sparkSession
    if num_partitions is None:
        try:
            num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except ValueError:
            num_partitions = 200
    ocols = _order_cols(order)
    # Column-expression group keys are materialized as named columns
    # FIRST: partitioning on the expression but grouping/joining on a
    # derived display name would reference a column `base` never had
    # (UNRESOLVED_COLUMN) — the expression must exist as a real column
    # through the whole partition/count/join pipeline.
    gnames: list[str] = []
    synth: list[str] = []
    proj = df
    for idx, g in enumerate(group):
        if isinstance(g, str):
            gnames.append(g)
        else:
            nm = f"__gr_g{idx}"
            proj = proj.withColumn(nm, g)
            gnames.append(nm)
            synth.append(nm)
    gcols = [F.col(n) for n in gnames]
    base = (
        proj.repartitionByRange(num_partitions, *gcols, *ocols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)  # same sampling barrier as above
    )
    counts = base.groupBy(_PID, *gnames).agg(F.count("*").alias(_CNT))
    offsets = counts.select(
        _PID,
        *gnames,
        F.coalesce(
            F.sum(_CNT).over(
                Window.partitionBy(*gnames)
                .orderBy(_PID)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias(_OFF),
    )
    return (
        base.withColumn(
            _LRN,
            F.row_number().over(
                Window.partitionBy(_PID, *gnames).orderBy(*ocols)
            ),
        )
        .join(F.broadcast(offsets), [_PID, *gnames])
        .withColumn(name, (F.col(_LRN) + F.col(_OFF)).cast("long"))
        .drop(_PID, _LRN, _OFF, *synth)
    )


def ntile_expr(rn: Column, n: Column, buckets: int) -> Column:
    """SQL NTILE(buckets) from a 1-based global row number ``rn`` and
    total count ``n`` under a total ordering. Standard rule: with
    q = n div k and r = n mod k, the first r buckets hold q+1 rows,
    the rest q. Matches ``F.ntile`` bit-for-bit (pinned in tests),
    including k > n (each row its own bucket)."""
    k = F.lit(buckets).cast("long")
    q = (n / k).cast("long")
    r = n % k
    head = r * (q + F.lit(1))
    return F.when(
        rn <= head, ((rn - 1) / (q + 1)).cast("long") + 1
    ).otherwise(r + ((rn - head - 1) / q).cast("long") + 1)


def percent_rank_expr(rn: Column, n: Column) -> Column:
    """PERCENT_RANK under a total ordering (rank == row_number):
    (rn-1)/(n-1), 0.0 for a single row — the exact double expression
    Spark's window function evaluates."""
    return F.when(n > 1, (rn - F.lit(1)).cast("double") / (n - F.lit(1))).otherwise(
        F.lit(0.0)
    )


def cume_dist_expr(rn: Column, n: Column) -> Column:
    """CUME_DIST under a total ordering (no peer groups): rn/n."""
    return rn.cast("double") / n
