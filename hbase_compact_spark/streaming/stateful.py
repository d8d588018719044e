"""Custom stateful streaming operators (applyInPandasWithState).

The reference holds exactly one piece of cross-batch state — the
region cursor it persists between iterations (QHBaseCompact.java:
102-115,133). The streaming generalization is arbitrary keyed state
maintained across micro-batches; we provide the canonical example:
exactly-once running totals per key, used as running per-user event
accounting over the `events` stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, batch_events long, total_events long, total_value double"
STATE_SCHEMA = "total_events long, total_micros long"


def _update_user_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into persistent
    (count, exact micro-unit sum) state and emit the updated running
    totals. The value column arrives pre-quantized to integer
    micro-units (stateful_user_totals), so the fold is exact integer
    addition — no float accumulation order, no Python-vs-SQL
    rounding: total_value is ONE IEEE division of exact integers,
    bit-identical to a decimal-sum oracle."""
    n = 0
    micros = 0
    for pdf in batches:
        n += len(pdf)
        # Python-int accumulation: a numpy int64 .sum() would WRAP
        # silently when one micro-batch's per-user total exceeds
        # int64 (each element is bounded by the JVM-side ANSI cast,
        # their SUM is not), and a float64 fallback would lose
        # exactness past 2^53 — both violate the documented
        # loud-or-exact contract.
        micros += sum(int(v) for v in pdf["value_micros"].tolist())
    if state.exists:
        total_n, total_micros = state.get
    else:
        total_n, total_micros = 0, 0
    total_n += n
    total_micros += micros
    state.update((total_n, total_micros))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "batch_events": [n],
            "total_events": [total_n],
            "total_value": [total_micros / 1_000_000],
        }
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user totals across micro-batches. State lives in
    the state store (checkpointed, partitioned by user), so this
    scales to any user cardinality a shuffle can hash.

    Values are quantized JVM-side to exact integer micro-units via
    DECIMAL(20,6) — the registry's cross-engine hashing rule: Python
    then folds exact integers and the final sum is independent of
    batch/partition order, matching `sum(CAST(value AS
    DECIMAL(20,6)))` in any SQL engine exactly.

    Domain bounds (explicit, not silent): NULL values are coalesced
    to 0 JVM-side BEFORE quantizing — SQL `sum` ignores NULLs while a
    NULL reaching pandas would turn the exact int64 fold into float64
    NaN arithmetic. And because micro-units live in int64, |value|
    must stay below ~9.2e12 (LONG_MAX/1e6) per event and per running
    per-user total; past that the long cast throws under Spark's
    default ANSI mode (a loud failure, never a silent wrap — with
    ANSI off the cast would wrap, so this operator requires ANSI)."""
    from pyspark.sql import functions as F

    from hbase_compact_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)
    quantized = events.select(
        "user_id",
        (
            F.coalesce(F.col("value").cast("decimal(20,6)"), F.lit(0))
            * 1_000_000
        )
        .cast("long")
        .alias("value_micros"),
    )
    return quantized.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
