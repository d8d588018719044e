"""Generic relational operators generalizing the reference's surface.

Each helper is DataFrame-in / DataFrame-out, pure DataFrame API, so
Catalyst keeps pushdown / pruning / partial aggregation. Reference
citations use QHC.java = /root/reference/src/main/java/com/qunar/dba/
QHBaseCompact.java.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_stats(
    df: DataFrame,
    keys: Sequence[str],
    size_col: str,
    *,
    count_alias: str = "filenum",
    sum_alias: str = "total_bytes",
) -> DataFrame:
    """Per-group COUNT + SUM + MIN/MAX/AVG in one hash-agg pass — the
    fused fold of QHC.java:152-161 (filenum/totalfilesize/maxfilesize).
    Spark computes all aggregates in a single partial+final pass.
    """
    return df.groupBy(*keys).agg(
        F.count("*").alias(count_alias),
        F.sum(size_col).alias(sum_alias),
        F.min(size_col).alias("min_bytes"),
        F.max(size_col).alias("max_bytes"),
        F.avg(size_col).alias("avg_bytes"),
    )


def argmax_by(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    arg_col: str,
    *,
    alias: str = "argmax",
) -> DataFrame:
    """Per-group arg-max: the *name* of the largest file
    (QHC.java:157-160 tracks maxfilesize + maxfilename in one pass).

    The reference keeps the FIRST max encountered on ties (strict `>`
    at :158); iteration order there is listing order, which is not a
    stable contract. We make ties deterministic instead: break ties by
    the LARGEST arg value, via a single-pass `max_by` over a
    lexicographically-ordered struct — no window sort, no shuffle
    beyond the aggregation itself, so it scales to any group count.
    """
    return df.groupBy(*keys).agg(
        F.max(value_col).alias("max_" + value_col),
        F.max_by(arg_col, F.struct(F.col(value_col), F.col(arg_col))).alias(alias),
    )


def having(df_grouped: DataFrame, predicate: Column) -> DataFrame:
    """Post-aggregation filter — the compactability gate `filenum > 1`
    (QHC.java:151). Just a filter over an aggregated frame; kept as a
    named op for parity with the inventory in SURVEY §2 (A10)."""
    return df_grouped.filter(predicate)


def rollup_with_total(
    df: DataFrame,
    keys: Sequence[str],
    size_col: str,
    *,
    total_label: str = "ALL",
) -> DataFrame:
    """Per-group sums AND the grand total in ONE pass via ROLLUP —
    the hand-rolled tableSize accumulation of QHC.java:237-255.
    SUBTOTAL rows (and only those) are relabeled via GROUPING(), the
    only marker that distinguishes them: a coalesce over the key
    would also swallow DATA-NULL key groups, producing duplicate
    'ALL' keys whose counts double-count when summed."""
    agg = df.rollup(*keys).agg(
        *[F.grouping(k).alias(f"__g_{k}") for k in keys],
        F.count("*").alias("filenum"),
        F.sum(size_col).alias("total_bytes"),
    )
    out = agg
    for k in keys:
        out = out.withColumn(
            k,
            F.when(F.col(f"__g_{k}") == 1, F.lit(total_label)).otherwise(
                F.col(k)
            ),
        ).drop(f"__g_{k}")
    return out


def topk(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """ORDER BY ... LIMIT k. Catalyst plans this as TakeOrderedAndProject
    — a per-partition top-k + driver merge, no global sort, so it is
    safe at any input size. Pass a unique tie-break column last so the
    selected SET is deterministic."""
    return df.orderBy(*order_by).limit(k)


def time_of_day_gate(
    df: DataFrame, ts_col: str, start_hhmmss: str, end_hhmmss: str
) -> DataFrame:
    """Rows whose timestamp's time-of-day lies in [start, end] — the
    reference's wall-clock window gate (QHC.java:48-60) turned into a
    data predicate. Matches its lexicographic compare semantics (`:52`),
    which are correct for zero-padded HH:mm:ss. A start > end
    (midnight-wrapping) window selects nothing, exactly like the
    reference's gate never opens in that configuration."""
    tod = F.date_format(F.col(ts_col), "HH:mm:ss")
    return df.filter(tod.between(start_hhmmss, end_hhmmss))


def running_window(
    df: DataFrame,
    partition_keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Running total + position over ordered partitions — generalizes
    the reference's positional region cursor (regionindex,
    QHC.java:133-146,193) into a window computation. `order_by` must
    end with a unique key for determinism."""
    w = Window.partitionBy(*partition_keys).orderBy(*order_by)
    return df.withColumn("rn", F.row_number().over(w)).withColumn(
        "running_total",
        F.sum(value_col).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def snapshot_diff(
    snap0: DataFrame,
    snap1: DataFrame,
    keys: Sequence[str],
    value_col: str,
    arg_col: str,
) -> DataFrame:
    """Change detection between two listings: groups whose arg-max file
    name changed — the batch analog of the reference's quickPoll
    completion predicate (QHC.java:171-184: re-list, recompute largest
    file, compare to the pre-compaction largest). Implemented as two
    single-pass arg-max aggregations + an equi-join on the group key
    (broadcastable when the group count is small)."""
    a0 = argmax_by(snap0, keys, value_col, arg_col, alias="file_before")
    a1 = argmax_by(snap1, keys, value_col, arg_col, alias="file_after")
    cond = [a0[k] == a1[k] for k in keys]
    return (
        a0.join(a1, cond, "inner")
        .where(F.col("file_before") != F.col("file_after"))
        .select(
            *[a0[k] for k in keys],
            "file_before",
            "file_after",
        )
    )
