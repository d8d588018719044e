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

__all__ = [
    "group_stats",
    "argmax_by",
    "having",
    "rollup_with_total",
    "topk",
    "time_of_day_gate",
    "running_window",
    "snapshot_diff",
]
