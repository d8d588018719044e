"""Ship this package to Spark executors.

Python workers deserialize our Pandas-UDF closures by module
reference, so `hbase_compact_spark` must be importable on every
executor. The driver process that calls us may have been started from
anywhere (the spark-graft driver does not run from the repo root), so
every UDF-bearing operator calls :func:`ensure_package_on_executors`
first — it zips the package once and registers it via
``sc.addPyFile``, which distributes it to all current AND future
executors. On a real cluster the same call works; packaging the wheel
into ``spark.submit.pyFiles`` would be the deploy-time equivalent.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_APPS: set[str] = set()


def ensure_package_on_executors(spark: SparkSession) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_APPS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"hbase_compact_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "hbase_compact_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED_APPS.add(app_id)
