"""Multi-format source/sink layer: CSV, JSON-lines, ORC, Parquet.

The reference's only inputs are HBase admin metadata and a java
properties file (QHBaseCompact.java:75-100); a standalone engine must
also ingest the column formats a data platform actually receives.
Readers always take an EXPLICIT schema — schema inference over CSV or
JSON is a full extra pass at 100 TB and silently mistypes columns
(ints that look like dates, empty strings vs NULL), so the engine
treats the schema as part of the table contract, exactly as the
snapshot log does for parquet.

Timestamp columns round-trip through an explicit ISO micros format on
the text formats; doubles round-trip exactly because Spark writes the
shortest decimal repr that parses back to the same IEEE value.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession

TEXT_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
FORMATS = ("parquet", "csv", "json", "orc")


def write_table(df: DataFrame, path: str, fmt: str) -> None:
    """Write `df` under `path` in `fmt`. Text formats carry an
    explicit timestamp format and (csv) a header + full quoting so
    the read side needs no guessing."""
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true").option("timestampFormat", TEXT_TS_FMT)
    elif fmt == "json":
        w = w.option("timestampFormat", TEXT_TS_FMT)
    elif fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported format {fmt!r}")
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str, schema
) -> DataFrame:
    """Schema-applied read of `path` in `fmt` (no inference pass)."""
    r = spark.read.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option("timestampFormat", TEXT_TS_FMT)
    elif fmt == "json":
        r = r.option("timestampFormat", TEXT_TS_FMT)
    elif fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported format {fmt!r}")
    return r.format(fmt).load(path)


def materialized_formats_root(
    spark: SparkSession, sf_dir: str, df: DataFrame, tag: str
) -> str:
    """One fingerprint-keyed /tmp materialization of `df` in every
    FORMAT, on the shared sources/memo.py discipline: the source
    parquet's identity (and the builder's logic rev) is in the
    directory name so a fixture regeneration rebuilds instead of
    serving stale copies, the tree is staged pid-suffixed and
    published by one atomic rename (existence == completeness;
    concurrent xdist writers race safely), and stale generations /
    crashed staging trees are swept."""
    from hbase_compact_spark.sources.memo import memo_root, publish, staging_dir

    root, complete = memo_root(sf_dir, tag, "orders", logic_rev="r6a")
    if complete:
        return root
    tmp = staging_dir(root)
    for fmt in FORMATS:
        write_table(df, posixpath.join(tmp, fmt), fmt)
    publish(tmp, root)
    return root
