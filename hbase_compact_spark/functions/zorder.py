"""Z-order (Morton) clustering expression for multi-column pruning.

Sorting a rewrite by ONE column gives parquet min/max pruning on that
column only; interleaving the bits of several columns' normalized
ranks gives useful min/max locality on ALL of them at once — the
standard data-layout trick (Delta OPTIMIZE ZORDER BY, Iceberg
sort-order) for tables queried along several independent dimensions.
At 100 TB this is the difference between pruning file lists on one
predicate or on any of them.

Implementation is pure Catalyst expressions: each column is min/max
normalized to a `bits`-wide integer (one tiny agg computes the
bounds, inlined as literals), and the z-value interleaves those bits
with shifts and ORs inside whole-stage codegen — no UDF, no shuffle
beyond the range partitioning the caller asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One aggregate pass collecting (min, max) per clustering column
    (numeric or timestamp; strings cluster via xxhash64 order buckets
    which destroys range pruning, so they are rejected — loudly, not
    by silently casting unparseable rows to bucket 0). NaN values are
    excluded from the bounds: Spark orders NaN as largest, so a
    single NaN max() would poison the span and collapse EVERY row's
    scaled value to one bucket, silently removing the column from the
    clustering."""
    from pyspark.sql import types as T

    schema = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        dt = schema.get(c)
        if dt is None:
            raise ValueError(f"z-order column {c!r} not in schema")
        if isinstance(dt, (T.StringType, T.BinaryType)):
            raise ValueError(
                f"z-order column {c!r} is {dt.simpleString()}: string "
                "order buckets destroy range pruning; cluster on a "
                "numeric/timestamp column instead"
            )
    aggs = []
    for c in cols:
        cd = F.col(c).cast("double")
        safe = F.when(F.isnan(cd), F.lit(None)).otherwise(cd)
        aggs += [F.min(safe).alias(f"__mn_{c}"),
                 F.max(safe).alias(f"__mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        mn, mx = row[f"__mn_{c}"], row[f"__mx_{c}"]
        if mn is None or mx is None:
            raise ValueError(f"z-order column {c} has no non-null values")
        out[c] = (float(mn), float(mx))
    return out


def zvalue_expr(
    bounds: dict[str, tuple[float, float]], bits: int = DEFAULT_BITS
) -> Column:
    """The interleaved z-value as a single BIGINT codegen expression.
    `bits` per column; len(bounds) * bits must fit in 63 bits."""
    cols = sorted(bounds)
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit z-value")
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        mn, mx = bounds[c]
        span = (mx - mn) or 1.0
        scaled = F.least(
            F.lit(top).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top),
            ),
        )
        # spread this column's bits to positions ci, ci+n, ci+2n, ...
        for b in range(bits):
            bit = F.shiftright(scaled, b).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + ci))
    return z


def cluster_by_zorder(
    df: DataFrame, cols: list[str], n_files: int, bits: int = DEFAULT_BITS
) -> DataFrame:
    """Range-partition `df` into `n_files` splits of the z-curve and
    sort each split by z — every output file then covers a compact
    hyper-rectangle of the clustered columns, so parquet footer
    min/max prunes scans filtered on ANY of them. One bounds agg +
    one range exchange; everything else is codegen."""
    bounds = column_bounds(df, cols)
    z = zvalue_expr(bounds, bits)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
