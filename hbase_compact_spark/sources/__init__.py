from hbase_compact_spark.sources.inventory import (
    INVENTORY_SQL,
    derived_inventory,
    file_inventory,
)

__all__ = ["derived_inventory", "file_inventory", "INVENTORY_SQL"]
