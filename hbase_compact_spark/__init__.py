"""hbase_compact_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference `louishust/hbase-compact`
(a graceful HBase major-compaction daemon; see
/root/reference/src/main/java/com/qunar/dba/QHBaseCompact.java) as an
idiomatic Spark engine:

* file-inventory analytics (scan/filter/aggregate/arg-max/rollup over
  `(table, region, family, file, size)` metadata rows),
* a Spark-based bulk compaction engine (small-file merging with
  bin-packing plans, atomic rewrite, checkpointed resume),
* plus the LLM-data-pipeline extension surface (dedup, similarity
  search, multimodal column plumbing, text analysis) mandated by the
  north star.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning
and join selection; Pandas UDFs are used only for genuinely procedural
operators (bin packing, multimodal decode).
"""

from hbase_compact_spark.session import get_spark
from hbase_compact_spark.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables", "TABLE_NAMES"]

__version__ = "0.1.0"
