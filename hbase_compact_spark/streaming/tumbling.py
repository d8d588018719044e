"""Structured Streaming operators.

The reference's only "streaming" is quickPoll — re-list a directory
every 10 ms until the largest file's name changes
(QHBaseCompact.java:62-73,171-184). Structured Streaming's file
source IS that loop done right: new files are discovered per
micro-batch, exactly once, with checkpointed progress. On top of it
we provide the standard windowed-aggregation surface for the `events`
stream table.
"""

from __future__ import annotations

import os
import posixpath
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Session-conf restores deferred until a bounded stream finishes: a
# genuine TIMESTAMP(NANOS) events fixture needs the legacy nanosAsLong
# flag for the stream's whole lifetime (every micro-batch re-reads the
# files under it), so events_stream cannot restore it inline — it
# parks (key, previous_value) here and run_bounded restores in its
# finally, so the flag never outlives the stream into unrelated batch
# reads. LIFO order: with two streams over the same fixture the later
# push saw the flag already set, so popping in reverse lands back on
# the true original. CONTRACT: build the source stream(s) for ONE
# bounded query and run_bounded it before building the next — the
# drain cannot attribute parked restores to streams, so an
# interleaved build-A, run-B ordering would restore A's flag early
# (every query in this repo follows build-then-run). Entries carry the
# parking thread's ident; run_bounded refuses to drain another
# thread's restores — the cheap detector for the concurrent-callers
# misuse this module-global protocol cannot survive.
_PENDING_CONF_RESTORES: list[tuple[str, str | None, int]] = []

# The production state-store backend for large state: the default
# HDFSBackedStateStoreProvider keeps every store's working set ON
# HEAP (maps of unsafe rows), so a 100 TB stream's sessionization or
# running-totals state is the component that OOMs first. RocksDB
# (built into Spark >= 3.2, rocksdbjni ships with the distribution)
# spills state to local SSD with bounded memtables — state size stops
# being a heap problem. Result parity with the default provider is
# pinned in tests/test_daemon_streaming.py; the conf is read at QUERY
# START, so the context manager below scopes it to one bounded run.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"

# Heavy stateful queries (session windows, per-key running totals —
# the operators whose state grows with the key domain) run under
# RocksDB BY DEFAULT (VERDICT r10 task 2): SCALE_r10 measured the
# default on-heap provider super-linear on stream_session's second
# decade (sf1→sf10 11.7× for 10× data) while RocksDB held 5.9× —
# the scale-safe backend is now the default code path, not an opt-in
# variant.
#
# POLICY (three-box A/B, SCALE_r10..r12 provider_ab): the SIGN of the
# RocksDB-vs-HDFS latency delta is box-dependent — r10's box measured
# RocksDB 2.5× faster at sf10, r11's and r12's measured HDFS ≤1.4×
# faster. The default optimizes the failure mode, not the median:
# on-heap state OOM-kills the executor once state exceeds heap (fatal
# at 100 TB), while RocksDB's worst measured cost is a bounded ≤1.4×.
# Deployments whose heavy state provably fits on-heap calibrate per
# box with HCS_HEAVY_STATE_PROVIDER=hdfs or an explicit session
# providerClass. Opt out (or redirect) via HCS_HEAVY_STATE_PROVIDER:
# "default" keeps the session's provider, anything else is used as
# the provider class verbatim. An EXPLICIT session-level provider
# (state_store_provider context manager / user conf) always wins —
# run_bounded only applies this when the session has no explicit
# providerClass, so parity tests can still force either backend.
_heavy_env = os.environ.get("HCS_HEAVY_STATE_PROVIDER", "rocksdb")
HEAVY_STATE_PROVIDER: str | None = {
    "default": None,
    "": None,
    "rocksdb": ROCKSDB_PROVIDER,
    "hdfs": HDFS_PROVIDER,
}.get(_heavy_env.lower(), _heavy_env)


class state_store_provider:
    """Context manager: run the enclosed bounded stream(s) under an
    alternate state-store provider class, restoring the session's
    previous setting on exit (exception-safe). Usage:

        with state_store_provider(spark, ROCKSDB_PROVIDER):
            out = stream_session(spark, sf_dir)
    """

    def __init__(self, spark: SparkSession, provider_class: str):
        self._spark = spark
        self._provider = provider_class
        self._prev: str | None = None

    def __enter__(self):
        self._prev = self._spark.conf.get(_PROVIDER_KEY, None)
        self._spark.conf.set(_PROVIDER_KEY, self._provider)
        return self

    def __exit__(self, *exc):
        if self._prev is None:
            self._spark.conf.unset(_PROVIDER_KEY)
        else:
            self._spark.conf.set(_PROVIDER_KEY, self._prev)
        return False


def staged_input_bytes(path: str) -> int:
    """Total parquet bytes under a staged stream input (single file,
    or a directory of batch/part files) — the driver-side size signal
    stream_state_width derives the state width from."""
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def stream_state_width(spark: SparkSession, staged_bytes: int) -> int:
    """Shuffle/state-store width for a bounded streaming query,
    derived from the staged input size: every stateful operator opens
    AND commits one store per shuffle partition per micro-batch (a
    stream-stream join holds four), so the per-batch floor is linear
    in the width while the work is linear in the data — a
    fixture-scale stream wants few stores, a rehearsal-scale one real
    parallelism. ~2 MB of staged input per partition, clamped to
    [1, defaultParallelism]; HCS_STREAM_STATE_PARTITIONS overrides
    for deployments whose state/input ratio differs. Measured at
    sf0.1 (stream_stream_join_outer, 5 pinned batches): addBatch
    1.3 s -> 0.6 s per batch going 8 -> 2 partitions, identical
    emissions."""
    env = os.environ.get("HCS_STREAM_STATE_PARTITIONS")
    if env:
        return max(1, int(env))
    return int(
        min(
            spark.sparkContext.defaultParallelism,
            max(1, staged_bytes // (2 << 20) + 1),
        )
    )


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` as a bounded stream (file source). Event-time
    normalization is shared with the batch path (tables.normalize_ts)
    so the two can never diverge on fixture-encoding changes."""
    from pyspark.sql.types import LongType

    from ..tables import normalize_ts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Scope the legacy NANOS flag to the schema read, same as
    # load_events — leaving it on session-wide silently loads
    # UNRELATED TIMESTAMP(NANOS) parquet columns as LongType forever
    # after. One exception: if the fixture really is NANOS (ts infers
    # as LongType), the flag must stay on for the stream's lifetime,
    # because every micro-batch re-reads the file under it.
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    # try/finally so a throwing schema read cannot leak the flag
    # session-wide; the NANOS case re-sets it below and defers the
    # restore to run_bounded's finally instead of leaving it forever.
    try:
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    if isinstance(schema["ts"].dataType, LongType):
        # genuine NANOS fixture: the flag must hold for the stream's
        # lifetime; parked for run_bounded to restore at termination
        spark.conf.set(key, "true")
        _PENDING_CONF_RESTORES.append((key, prev, threading.get_ident()))
    # pathGlobFilter matches LEAF FILES only, so when events.parquet
    # is a DIRECTORY of part files (every real table; the sf1
    # rehearsal dataset) the filtered listing of sf_dir was EMPTY and
    # the stream silently produced zero rows. Directories stream
    # directly; the single-file fixture keeps the name-filtered
    # parent listing (the file source wants a directory to monitor).
    import os

    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        stream = spark.readStream.schema(schema).parquet(path)
    else:
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    return normalize_ts(stream)


def tumbling_counts(events: DataFrame, window: str = "6 hours") -> DataFrame:
    """Tumbling-window counts + exact sums with a 1 h watermark for
    late data. Windows align to the epoch, so results are comparable
    with any batch engine's `epoch_us // width` bucketing."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_bounded(
    agg: DataFrame,
    *,
    mode: str = "complete",
    n_partitions: int | None = None,
    timeout: float = 600.0,
    progress: list | None = None,
    heavy_state: bool = False,
    sink: str = "memory",
) -> DataFrame:
    """Drive a (bounded) streaming aggregation to completion with an
    availableNow trigger into a memory sink and return the result as
    a batch DataFrame. `complete` mode because a single availableNow
    batch never advances the watermark far enough for append mode to
    emit the final windows.

    `n_partitions` sizes the STATE STORE: every stateful operator
    initializes one store per shuffle partition per side, so a small
    stream wants far fewer than the cluster's core count (and a 100 TB
    stream wants more) — it is pinned per query at start time. The
    session's own shuffle-partition setting is restored afterwards so
    the streaming sizing never leaks into later batch queries sharing
    the session. The memory sink is NOT fault-tolerant (Spark refuses
    to restart one from a checkpoint) — checkpoint-recovery flows use
    a foreachBatch sink instead (stream_restart_recovery).

    The returned DataFrame is the memory sink's rows eagerly
    localCheckpoint'ed into executor block storage, with the sink's
    temp view dropped before returning — so the result stays valid
    across any number of later run_bounded calls (the old
    consume-before-next-stream footgun, where the next call dropped
    the view under a stale frame, is gone) and the blocks free when
    the frame is garbage collected.

    CONTRACT (module-global protocol, single-threaded by design):
    BUILD-THEN-RUN — build the source stream(s) for ONE bounded
       query (events_stream may park session-conf restores) and
       run_bounded it before building the next query's sources;
       parked restores from a DIFFERENT thread raise RuntimeError
       below instead of being silently mis-attributed."""
    spark = agg.sparkSession
    for key, _val, tid in _PENDING_CONF_RESTORES:
        if tid != threading.get_ident():
            raise RuntimeError(
                "run_bounded: pending session-conf restore for "
                f"{key!r} was parked by another thread — the "
                "build-then-run contract (see run_bounded docstring) "
                "does not support concurrent bounded streams on one "
                "session"
            )
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        n_partitions or spark.sparkContext.defaultParallelism,
    )
    # heavy_state: the caller declares key-domain-sized state (session
    # windows, per-key running totals) — run under the scale-safe
    # default provider (RocksDB; module docs above). Scoped to this
    # one bounded run like the shuffle-partition sizing. An EXPLICIT
    # session-level providerClass (state_store_provider context /
    # user conf) wins — this is a default, not an override.
    prev_provider = spark.conf.get(_PROVIDER_KEY, None)
    provider_set = (
        heavy_state
        and HEAVY_STATE_PROVIDER is not None
        and prev_provider is None
    )
    if provider_set:
        spark.conf.set(_PROVIDER_KEY, HEAVY_STATE_PROVIDER)
    # sink="parquet": a foreachBatch per-batch parquet sink instead
    # of the memory sink — APPEND-mode drains whose emission is
    # table-sized (stream_session at the sf10 rehearsal finalizes
    # millions of sessions) must not round-trip the result through
    # the DRIVER: the memory sink collects every emitted row there
    # before the caller redistributes it (the stream_table_tail
    # lesson — measured 45 s vs 8 s at sf10). Emissions land on
    # executors, the union reads back distributed. Append-only: a
    # complete-mode stream re-emits FULL state per trigger, which a
    # per-batch-dir union would double-count.
    # sink="noop": metrics-only drains (the caller reads ONLY the
    # progress list — watermark books, state-operator counters).
    # Emitted rows are discarded executor-side through the noop batch
    # writer, so an update-mode stream whose group state is
    # table-sized (stream_late_data at sf10: millions of (window,
    # user) rows) never round-trips the driver at all. Returns an
    # empty frame in the agg's schema.
    if sink not in ("memory", "parquet", "noop"):
        raise ValueError(
            f"run_bounded sink must be memory|parquet|noop: {sink}"
        )
    if sink == "parquet" and mode != "append":
        raise ValueError(
            "run_bounded sink='parquet' unions per-batch emissions — "
            "only append mode emits each row exactly once"
        )
    import shutil
    import tempfile

    name = None
    sink_base = None
    try:
        name = f"stream_out_{uuid.uuid4().hex[:10]}"
        if sink == "parquet":
            sink_base = tempfile.mkdtemp(prefix=f"hcs_bounded_{name}_")
            out_dir = posixpath.join(sink_base, "out")

            def _sink(bdf: DataFrame, bid: int) -> None:
                bdf.write.mode("overwrite").parquet(
                    posixpath.join(out_dir, f"b{bid:05d}")
                )

            writer = agg.writeStream.foreachBatch(_sink).option(
                "checkpointLocation", posixpath.join(sink_base, "ckpt")
            )
        elif sink == "noop":
            sink_base = tempfile.mkdtemp(prefix=f"hcs_bounded_{name}_")

            def _discard(bdf: DataFrame, bid: int) -> None:
                bdf.write.format("noop").mode("overwrite").save()

            writer = agg.writeStream.foreachBatch(_discard).option(
                "checkpointLocation", posixpath.join(sink_base, "ckpt")
            )
        else:
            writer = agg.writeStream.format("memory").queryName(name)
        q = (
            writer.outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout):
            # a bounded availableNow run past its budget (default 10
            # min; sf1/bench callers pass more) is wedged; returning a
            # partial memory sink would silently under-count. The
            # caller's progress list still gets what ran (do NOT
            # rebind the parameter — that would discard the caller's
            # reference on the one path where diagnostics matter).
            if progress is not None:
                progress.extend(q.recentProgress)
            last = q.lastProgress
            q.stop()
            raise RuntimeError(
                f"bounded streaming query did not finish in {timeout} s; "
                f"lastProgress={last}"
            )
        if progress is not None:
            # per-micro-batch progress (batchId, numInputRows, ...) so
            # callers/tests can assert the run was genuinely multi-
            # batch rather than one availableNow catch-all batch
            progress.extend(q.recentProgress)
        # the memory sink holds the result rows on the driver (bounded
        # fixture streams are driver-sized by construction; a
        # production unbounded stream would use a real sink, never
        # `memory`). Materialize ONCE into executor block storage and
        # drop the sink view immediately: the returned frame no longer
        # depends on a temp view a later run_bounded call would drop,
        # so stale-frame TABLE_OR_VIEW_NOT_FOUND surprises cannot
        # happen, and bench loops still hold one result's blocks at a
        # time (freed when the frame is GC'd).
        if sink == "noop":
            return spark.createDataFrame([], agg.schema)
        if sink == "parquet":
            # distributed read-back of the per-batch emissions; an
            # all-empty drain still returns the agg's schema
            import glob as _glob

            if _glob.glob(posixpath.join(out_dir, "b*")):
                out = spark.read.schema(agg.schema).parquet(
                    posixpath.join(out_dir, "b*")
                ).localCheckpoint(eager=True)
            else:
                out = spark.createDataFrame([], agg.schema)
            return out
        out = spark.table(name).localCheckpoint(eager=True)
        return out
    finally:
        # drop the sink view on EVERY exit (success, timeout raise, or
        # checkpoint failure) — otherwise an error path leaves the
        # full result row set registered on the driver for the session
        # lifetime; the success path's returned frame is already
        # checkpointed and does not depend on the view
        if name is not None and sink == "memory":
            try:
                spark.catalog.dropTempView(name)
            except Exception:
                pass  # view never got registered (start() failed)
        if sink_base is not None:
            # the result is already localCheckpoint'ed into executor
            # blocks; the staging tree (and its checkpoint) can go
            shutil.rmtree(sink_base, ignore_errors=True)
        if prev is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        if provider_set:
            spark.conf.unset(_PROVIDER_KEY)
        # restore any session flags the stream's sources needed for
        # their lifetime (e.g. nanosAsLong for NANOS fixtures) — LIFO
        # so nested pushes unwind to the true original
        while _PENDING_CONF_RESTORES:
            k, v, _tid = _PENDING_CONF_RESTORES.pop()
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
