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
    checkpoint_dir: str | None = None,
) -> StreamWatchResult:
    """Watch `directory` through a file-source stream until the
    largest LIVE file's name differs from `before_argmax`, or the
    budget (the reference's 40 s/GB heuristic —
    watch.wait_budget_seconds) runs out.

    Only the file METADATA columns are touched, so each micro-batch is
    a footer-less scan. Pass `checkpoint_dir` to make a RESTARTED
    watch resume discovery from the stream's checkpoint instead of
    re-processing; without it a throwaway checkpoint is created and
    REMOVED when the watch returns (a daemon calling the watch per
    compaction must not leak tmp state).

    Deletions are first-class: the arg-max is evaluated over
    discovered-AND-STILL-PRESENT files each batch (compaction deletes
    its inputs, so a once-seen largest file must retire from the fold
    rather than pin the arg-max forever), and the completeness gate
    requires every initially-present file that still exists to have
    been DISCOVERED (by name — a bare count could be satisfied by the
    wrong files mid-deletion and fire on a partial arg-max). The gate
    errs conservative: a too-early fire would report a completion that
    never happened, while the gate's worst case is an honest
    budget-exhausted result."""
    import shutil

    from hbase_compact_spark.compaction.executor import _hadoop_fs

    fs, dpath, _jvm = _hadoop_fs(spark, directory)

    def _list_names() -> set[str]:
        try:
            return {
                st.getPath().getName()
                for st in fs.listStatus(dpath)
                if st.getPath().getName().endswith(".parquet")
            }
        except Exception:  # directory vanished mid-compaction
            return set()

    initial_names = _list_names()
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
        "batches": 0,
        "discovered": {},  # name -> size, bounded file metadata
    }
    fired = threading.Event()

    def fold_batch(batch_df, batch_id: int) -> None:
        state["batches"] += 1
        rows = batch_df.collect()  # bounded: one row per new FILE
        for r in rows:
            state["discovered"][posixpath.basename(r["path"])] = int(
                r["size"]
            )
        current = _list_names()
        live = {
            n: sz
            for n, sz in state["discovered"].items()
            if n in current
        }
        if live:
            state["argmax"] = max(live, key=lambda n: (live[n], n))
        # completeness: every start-time file that STILL EXISTS must
        # have been discovered by name before the arg-max is trusted
        pending = (initial_names & current) - state["discovered"].keys()
        if (
            not pending
            and live
            and state["argmax"] != before_argmax
        ):
            fired.set()

    owned_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="watch_ckpt_")
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
        if owned_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)
    return StreamWatchResult(
        changed=fired.is_set(),
        batches=state["batches"],
        waited_s=time.monotonic() - t0,
        final_argmax=state["argmax"],
    )
