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
STATE_SCHEMA = "total_events long, total_value double"


def _update_user_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into persistent
    (count, value-sum) state and emit the updated running totals."""
    n = 0
    v = 0.0
    for pdf in batches:
        n += len(pdf)
        v += float(pdf["value"].sum())
    if state.exists:
        total_n, total_v = state.get
    else:
        total_n, total_v = 0, 0.0
    total_n += n
    total_v += v
    state.update((total_n, total_v))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "batch_events": [n],
            "total_events": [total_n],
            "total_value": [round(total_v, 6)],
        }
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user totals across micro-batches. State lives in
    the state store (checkpointed, partitioned by user), so this
    scales to any user cardinality a shuffle can hash."""
    from hbase_compact_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
