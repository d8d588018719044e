from hbase_compact_spark.compaction.checkpoint import CompactionCheckpoint
from hbase_compact_spark.compaction.executor import CompactionReport, compact_table
from hbase_compact_spark.compaction.planner import plan_bins

__all__ = ["plan_bins", "compact_table", "CompactionReport", "CompactionCheckpoint"]
