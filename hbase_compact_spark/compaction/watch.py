"""Completion watching — the quickPoll analog (QHBaseCompact.java:
62-73,171-184).

The reference re-lists a store directory every 10 ms until the
LARGEST FILE'S NAME differs from its pre-compaction value, with a
40 s/GB time budget (:170) and a soft-fail on timeout (:71-72, it
just warns and moves on). Our version keeps the budget heuristic but
each tick is a distributed listing + single-pass arg-max query, and
exhaustion is reported honestly to the caller instead of being
swallowed.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# the reference's linear cost model: 40 s per GB (QHBaseCompact.java:170)
SECONDS_PER_GB = 40.0


def wait_budget_seconds(total_bytes: int, *, floor_s: float = 5.0) -> float:
    return max(floor_s, total_bytes / 1024**3 * SECONDS_PER_GB)


def current_argmax_file(spark: SparkSession, directory: str) -> str | None:
    """Name of the largest file in `directory` (ties -> largest name,
    deterministic — the reference's listing-order tie behavior is not
    a stable contract)."""
    rows = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(directory)
        .select("path", "length")
        .agg(
            F.max_by(
                "path", F.struct(F.col("length"), F.col("path"))
            ).alias("argmax")
        )
        .collect()
    )
    if not rows or rows[0]["argmax"] is None:
        return None
    return rows[0]["argmax"].rsplit("/", 1)[-1]


@dataclass
class WatchResult:
    changed: bool
    ticks: int
    waited_s: float
    final_argmax: str | None


def poll_until_changed(
    spark: SparkSession,
    directory: str,
    before_argmax: str | None,
    *,
    budget_s: float,
    tick_s: float = 0.2,
) -> WatchResult:
    """Poll the directory until the arg-max file name differs from
    `before_argmax` or the budget runs out. Returns changed=False on
    exhaustion — the caller decides (the rewrite executor already
    hard-verifies content, so this watch is an operational signal,
    not the correctness gate the reference made of it)."""
    deadline = time.monotonic() + budget_s
    ticks = 0
    t0 = time.monotonic()
    while True:
        ticks += 1
        now_argmax = current_argmax_file(spark, directory)
        if now_argmax != before_argmax:
            return WatchResult(True, ticks, time.monotonic() - t0, now_argmax)
        if time.monotonic() >= deadline:
            return WatchResult(False, ticks, time.monotonic() - t0, now_argmax)
        time.sleep(tick_s)
