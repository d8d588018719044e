"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``hbase_compact_spark.workload_*`` and register
themselves into ``hbase_compact_spark.registry``; this module only
exposes the registry to the driver.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable no matter where the driver runs from.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# All workload modules import UNguarded: every one exists and
# registers queries, so a transitive ImportError must fail the run
# loudly — a swallow-and-continue here would silently shrink the
# verified query surface and report the regression as success.
import hbase_compact_spark.workload_core  # noqa: E402,F401
import hbase_compact_spark.workload_llm  # noqa: E402,F401
import hbase_compact_spark.workload_compaction  # noqa: E402,F401
import hbase_compact_spark.workload_streaming  # noqa: E402,F401
import hbase_compact_spark.workload_olap  # noqa: E402,F401

from hbase_compact_spark.registry import ORACLE, QUERIES  # noqa: E402
from hbase_compact_spark.tables import SMOKE_SF_DIR  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The Spark analog of the reference's stats report
    (QHBaseCompact.java:219-270): fused per-group COUNT/SUM/AVG/MIN/MAX
    in TPC-H-Q1 shape over `lineitem`.
    """
    return QUERIES["groupby_stats"](spark, SMOKE_SF_DIR)


def _verification_priority() -> list[str]:
    """Order query names so the least-driver-verified come first.

    The per-round correctness harness records at most the first N
    queries it is handed (r1 recorded exactly 50 of 62), so a fixed
    registration order starves the tail forever. Rank every
    registered query by (1) the LATEST round whose
    CORRECTNESS_r*.json verified it (hash-green, or rows-only by
    design) — never-verified and previously-mismatched queries sort
    first, then the longest-unverified — then (2) total times
    verified, ties broken by registration order. Recency is the
    primary key (not cumulative count, which let a freshly-verified
    count-1 query outrank a two-rounds-stale count-2 one), so the
    window always drains the stalest queries first. Self-maintaining:
    each new round's JSON shifts the rotation.
    """
    import json

    verified_counts: dict[str, int] = {name: 0 for name in QUERIES}
    latest_green: dict[str, int] = {name: 0 for name in QUERIES}
    for path in sorted(Path(_REPO).glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(path.stem.split("_r")[1])
            rows = json.loads(path.read_text())
        except (OSError, ValueError, IndexError):
            continue
        for name, row in rows.items():
            if name not in verified_counts or not isinstance(row, dict):
                continue
            ok = row.get("hash_match") is True or row.get("err") == "no_oracle"
            if ok:
                verified_counts[name] += 1
                latest_green[name] = max(latest_green[name], rnd)
    order = {name: i for i, name in enumerate(QUERIES)}
    return sorted(
        QUERIES,
        key=lambda n: (latest_green[n], verified_counts[n], order[n]),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    least-verified first (see _verification_priority)."""
    return {name: QUERIES[name] for name in _verification_priority()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each SQL-expressible query."""
    return {name: ORACLE[name] for name in _verification_priority() if name in ORACLE}
