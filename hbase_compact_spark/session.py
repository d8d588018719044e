"""SparkSession factory.

Local mode is used for tests/bench (local[N], one JVM); every config
here is also what we would set on a real multi-executor cluster —
AQE for runtime re-planning (shuffle coalescing, skew-join splitting),
UTC session time zone for oracle comparability, Arrow for the
Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hbase_compact_spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all
    cores). Shuffle partitions follow the core count — on a real
    cluster this would instead be sized to ~2-3x total executor cores
    and AQE coalesces the rest.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Parquet ns timestamps (events.ts) must not error out.
        .config("spark.sql.legacy.parquet.nanosAsLong", "false")
        # Python data-source filter pushdown (sources/snapshot_table
        # prunes files from pushed predicates; off by default in 4.1)
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
