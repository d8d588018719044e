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
  is plain double on both sides. Known edge: the INPUT cast itself
  rounds differently across engines for a double whose shortest
  decimal repr terminates in a '5' exactly at the 7th decimal digit
  (Spark rounds the shortest repr HALF_UP, DuckDB rounds the binary
  value) — ~1e-7 density per uniform value, absent from the driver
  fixtures; queries needing immunity at arbitrary distributions
  should quantize upstream of the cast.
* integral-valued doubles (l_quantity) sum exactly in IEEE — no cast.
* averages / cosines: round(..., 4..6) — error is ~1e-10 relative,
  far below the rounding grain.
* timestamps are formatted to strings (Spark session TZ pinned UTC).
* every computed column is aliased identically in both dialects.
* substr/substring with START = 0 DIVERGES (Spark treats 0 as
  position 1 and takes `len` chars; DuckDB starts the `len`-window
  at virtual position 0 and yields one char fewer) — oracles must
  use 1-based or negative starts only (negative-from-end semantics
  agree).
* probed dialect traps (r5 sweep, tests/test_oracle_fuzz.py):
  - concat(): Spark is NULL-propagating, DuckDB SKIPS NULL args —
    use concat_ws (identical on both) or `||` (NULL-propagating on
    both) when an argument can be NULL.
  - array indexing: Spark `arr[i]` is 0-based, DuckDB 1-based —
    never compare raw indexed elements without the offset.
  - date_trunc returns TIMESTAMP on Spark but DATE on DuckDB for
    week/quarter granularity — strftime/date_format to a shared
    string form.
  - array_join is Spark-only; DuckDB spells it array_to_string.
  - NaN cast to string renders 'NaN' (Spark) vs '-nan'/'nan'
    (DuckDB) — never let NaN reach a hashed string column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Session-scoped memo dicts registered by workload modules (shared
# intermediates such as the MinHash pair list). bench.py clears them
# before every timed run so benchmark medians measure the engine, not
# a result cache; the driver's one-pass correctness run keeps them.
SESSION_CACHES: list[dict] = []


def session_cache() -> dict:
    """Create and register a session-scoped memo dict."""
    cache: dict = {}
    SESSION_CACHES.append(cache)
    return cache


def clear_session_caches() -> None:
    """Drop every session-scoped memo AND free its storage. The
    cached values are localCheckpoint'ed / persisted DataFrames whose
    blocks live in the block manager's (partially eviction-protected)
    storage pool — merely clearing the dicts keeps the blocks alive
    until the JVM notices the dropped references, and a long sweep at
    sf1+ fills the pool until some later query's broadcast build dies
    with UNABLE_TO_ACQUIRE_MEMORY. Unpersist what we can reach and
    nudge the GC so the ContextCleaner can reclaim checkpoint blocks
    promptly."""
    import gc

    def _unpersist(v) -> None:
        if isinstance(v, DataFrame):
            try:
                v.unpersist(False)
            except Exception:
                pass
        elif isinstance(v, (tuple, list)):
            for item in v:
                _unpersist(item)

    for cache in SESSION_CACHES:
        for v in list(cache.values()):
            _unpersist(v)
        cache.clear()
    gc.collect()


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; `oracle` is the DuckDB twin (omit for
    non-SQL-expressible ops — driver then does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
