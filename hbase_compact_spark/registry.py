"""Named-query registry.

Every operator the engine claims in SURVEY.md §2 Part B registers here
as a `(spark, sf_dir) -> DataFrame` callable, optionally with a
DuckDB-dialect oracle SQL twin. `__spark_entry__.queries()` /
`oracle_sql()` just expose these dicts to the driver.

Cross-engine hashing rules (driver compares row-count + schema +
order-insensitive value hash, so Spark and DuckDB must produce
bit-identical values):

* exact-sum doubles through DECIMAL: ``CAST(sum(CAST(x AS
  DECIMAL(20,6))) AS DOUBLE)`` — both engines sum decimals exactly,
  the final double conversion is deterministic, and the output type
  is plain double on both sides.
* integral-valued doubles (l_quantity) sum exactly in IEEE — no cast.
* averages / cosines: round(..., 4..6) — error is ~1e-10 relative,
  far below the rounding grain.
* timestamps are formatted to strings (Spark session TZ pinned UTC).
* every computed column is aliased identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; `oracle` is the DuckDB twin (omit for
    non-SQL-expressible ops — driver then does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
