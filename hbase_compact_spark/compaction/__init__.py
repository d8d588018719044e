from hbase_compact_spark.compaction.checkpoint import CompactionCheckpoint
from hbase_compact_spark.compaction.daemon import (
    DaemonConfig,
    daemon_config_from_properties,
    run_daemon,
    stats_report,
)
from hbase_compact_spark.compaction.executor import (
    CompactionReport,
    compact_table,
    purge_trash,
)
from hbase_compact_spark.compaction.planner import plan_bins
from hbase_compact_spark.compaction.watch import poll_until_changed, wait_budget_seconds

__all__ = [
    "plan_bins",
    "compact_table",
    "purge_trash",
    "CompactionReport",
    "CompactionCheckpoint",
    "DaemonConfig",
    "daemon_config_from_properties",
    "run_daemon",
    "stats_report",
    "poll_until_changed",
    "wait_budget_seconds",
]
