"""Streaming completion watch — the quickPoll analog done as a real
Structured Streaming query (Flow 3, QHBaseCompact.java:62-73,171-184).

The reference re-lists a store directory every 10 ms until the
largest file's name changes. compaction/watch.py keeps that shape as
a batch poll; this module replaces the poll with Spark's file-source
stream: each new file in the directory is discovered EXACTLY ONCE per
micro-batch (checkpointed, no re-listing race), and a foreachBatch
sink folds the discovered (name, size) pairs into a running arg-max.
The watch fires when the arg-max file name differs from its
pre-compaction value — the reference's completion predicate
(QHC.java:182) — and reports budget exhaustion honestly instead of
soft-failing (QHC.java:71-72 warns and proceeds).

At scale this is the right primitive: the file stream's discovery
cost is the same NameNode/object-store listing the poll pays, but
paid incrementally with progress checkpointed, and the per-batch work
is metadata-only (the data columns are never read).
"""

from __future__ import annotations

import posixpath
import tempfile
import threading
import time
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass
class StreamWatchResult:
    changed: bool
    batches: int
    waited_s: float
    final_argmax: str | None


def stream_until_changed(
    spark: SparkSession,
    directory: str,
    before_argmax: str | None,
    *,
    budget_s: float,
    tick_s: float = 0.2,
) -> StreamWatchResult:
    """Watch `directory` through a file-source stream until the
    largest file's name differs from `before_argmax`, or the budget
    (the reference's 40 s/GB heuristic — watch.wait_budget_seconds)
    runs out.

    Only the file METADATA columns are touched, so each micro-batch
    is a footer-less scan; discovery state lives in the stream's own
    checkpoint, so a restarted watch never re-processes files.

    The fire predicate is gated on having discovered at least the
    files present at watch start: with more pre-existing files than
    maxFilesPerTrigger, an early micro-batch's PARTIAL arg-max could
    otherwise differ from `before_argmax` and fire before anything
    changed. The gate errs conservative — a too-early fire would
    report a completion that never happened, while the gate's worst
    case is an honest budget-exhausted result.
    """
    from hbase_compact_spark.compaction.executor import _hadoop_fs

    fs, dpath, _jvm = _hadoop_fs(spark, directory)
    initial_files = sum(
        1
        for st in fs.listStatus(dpath)
        if st.getPath().getName().endswith(".parquet")
    )
    schema = spark.read.parquet(directory).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 64)
        .parquet(directory)
    )
    meta = stream.select(
        F.col("_metadata.file_path").alias("path"),
        F.col("_metadata.file_size").alias("size"),
    ).distinct()

    state = {
        "argmax": before_argmax,
        "max": (-1, ""),
        "batches": 0,
        "seen": 0,
    }
    fired = threading.Event()

    def fold_batch(batch_df, batch_id: int) -> None:
        state["batches"] += 1
        rows = batch_df.collect()  # bounded: one row per new FILE
        state["seen"] += len(rows)
        for r in rows:
            name = posixpath.basename(r["path"])
            key = (int(r["size"]), name)
            if key > state["max"]:
                state["max"] = key
                state["argmax"] = name
        # The completeness gate must not assume every start-time file
        # will be DISCOVERED: compaction deletes its inputs, so a
        # pre-existing file removed before its first micro-batch never
        # arrives and `seen >= initial_files` would starve the watch
        # for its whole budget. Re-list per batch and require only the
        # files that still exist (capped by the start-time count, so
        # files created after start can't satisfy the gate alone).
        try:
            still_present = sum(
                1
                for st in fs.listStatus(dpath)
                if st.getPath().getName().endswith(".parquet")
            )
        except Exception:  # directory vanished mid-compaction
            still_present = 0
        required = min(initial_files, still_present)
        if state["seen"] >= required and state["argmax"] != before_argmax:
            fired.set()

    ckpt = tempfile.mkdtemp(prefix="watch_ckpt_")
    q = (
        meta.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime=f"{max(tick_s, 0.1):.1f} seconds")
        .start()
    )
    t0 = time.monotonic()
    deadline = t0 + budget_s
    try:
        while not fired.is_set() and time.monotonic() < deadline:
            if q.exception() is not None:
                raise q.exception()
            time.sleep(min(tick_s, 0.1))
    finally:
        q.stop()
    return StreamWatchResult(
        changed=fired.is_set(),
        batches=state["batches"],
        waited_s=time.monotonic() - t0,
        final_argmax=state["argmax"],
    )
