"""Streaming workload — SURVEY.md §2 Part B `stream_tumbling`.

The oracle is the batch-equivalent SQL over the same bounded events
table (SURVEY §7 M4): a genuinely streaming execution whose result
must equal the batch answer — the strongest correctness statement a
bounded stream can make.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hbase_compact_spark.registry import query
from hbase_compact_spark.streaming.tumbling import (
    events_stream,
    run_bounded,
    tumbling_counts,
)


@query(
    "stream_tumbling",
    oracle="""
    SELECT strftime(make_timestamp((epoch_us(ts) // 21600000000)
                                   * 21600000000),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour tumbling windows over the events stream, executed as a
    real Structured Streaming query (file source -> watermark ->
    windowed agg -> memory sink, availableNow trigger)."""
    return run_bounded(tumbling_counts(events_stream(spark, sf_dir)))
