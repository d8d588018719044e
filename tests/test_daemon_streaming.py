"""Daemon orchestration (Flow 1), completion watch (Flow 3 / quickPoll
analog) and stateful streaming tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hbase_compact_spark.compaction.daemon import DaemonConfig, run_daemon, stats_report
from hbase_compact_spark.compaction.executor import _fingerprint
from hbase_compact_spark.compaction.watch import (
    current_argmax_file,
    poll_until_changed,
    wait_budget_seconds,
)
from hbase_compact_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def small_files_table(spark, tmp_path):
    root = str(tmp_path / "table")
    ev = load_table(spark, SF_DIR, "events").drop("ts")
    for i, part in enumerate(["p0", "p1"]):
        (
            ev.filter(F.col("event_id") % 2 == i)
            .repartition(12)
            .write.mode("overwrite")
            .parquet(f"{root}/region={part}")
        )
    for dirpath, _, files in os.walk(root):
        for f in files:
            if not f.endswith(".parquet"):
                os.unlink(os.path.join(dirpath, f))
    return root


def test_daemon_full_run(spark, small_files_table):
    root = small_files_table
    before = _fingerprint(spark.read.parquet(root))

    run = run_daemon(
        spark,
        DaemonConfig(
            table_root=root,
            target_bytes=64 * 1024 * 1024,
            window=("00:00:00", "23:59:59"),
            inter_partition_pause_s=0.0,
            cycle_pause_s=0.0,
            max_cycles=1,
            partitions_per_iteration=1,
        ),
    )

    # startup stats report includes per-partition rows + ALL rollup
    parts = {r["partition"]: r for r in run.stats_report}
    assert set(parts) == {"region=p0", "region=p1", "ALL"}
    assert parts["ALL"]["filenum"] == parts["region=p0"]["filenum"] + parts["region=p1"]["filenum"]

    # one partition per iteration -> two compacting passes + one empty
    compacted = [r.compacted[0].partition for r in run.cycles if r.compacted]
    assert compacted == ["region=p0", "region=p1"]
    assert run.cycles[-1].compacted == []

    assert _fingerprint(spark.read.parquet(root)) == before
    # wraparound reset the checkpoint for the next cycle
    import json

    assert json.load(open(f"{root}/_compaction_checkpoint.json")) == {}


def test_daemon_from_reference_properties(spark, small_files_table, tmp_path):
    """The reference's full boot story: properties file -> typed
    config -> daemon (window from starttime/endtime, target from
    directcompactsize) -> compaction -> resumable checkpoint."""
    from hbase_compact_spark.compaction import daemon_config_from_properties

    props = tmp_path / "config.properties"
    props.write_text(
        "regionindex=0\n"
        "tablename=t\n"
        "starttime=00\\:00\\:00\n"
        "endtime=23\\:59\\:59\n"
        "marjorfilesize=530000000000\n"
        "directcompactsize=100000000000\n"
    )
    cfg = daemon_config_from_properties(
        str(props),
        small_files_table,
        inter_partition_pause_s=0.0,
        cycle_pause_s=0.0,
        partitions_per_iteration=10,
    )
    assert cfg.window == ("00:00:00", "23:59:59")
    assert cfg.target_bytes == 1 << 30  # capped below directcompactsize
    before = _fingerprint(spark.read.parquet(small_files_table))
    run = run_daemon(spark, cfg)
    assert sum(len(c.compacted) for c in run.cycles) == 2  # p0, p1
    assert _fingerprint(spark.read.parquet(small_files_table)) == before


def test_watch_detects_rewrite(spark, small_files_table):
    part_dir = f"{small_files_table}/region=p0"
    before = current_argmax_file(spark, part_dir)
    assert before is not None

    run_daemon(
        spark,
        DaemonConfig(
            table_root=small_files_table,
            target_bytes=64 * 1024 * 1024,
            inter_partition_pause_s=0.0,
            cycle_pause_s=0.0,
        ),
    )
    res = poll_until_changed(spark, part_dir, before, budget_s=10, tick_s=0.1)
    assert res.changed and res.final_argmax != before
    assert res.final_argmax.startswith("compacted-")


def test_watch_budget_exhaustion(spark, small_files_table):
    part_dir = f"{small_files_table}/region=p0"
    before = current_argmax_file(spark, part_dir)
    res = poll_until_changed(spark, part_dir, before, budget_s=0.5, tick_s=0.1)
    assert not res.changed and res.ticks >= 1


def test_wait_budget_matches_reference_model():
    # 40 s per GB (QHBaseCompact.java:170), floored for tiny stores
    assert wait_budget_seconds(2 * 1024**3) == 80.0
    assert wait_budget_seconds(1024) == 5.0


def test_stateful_user_totals(spark, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches:
    two files + maxFilesPerTrigger=1 forces two batches; final state
    must equal the batch-computed totals."""
    from hbase_compact_spark.streaming.stateful import stateful_user_totals

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    ev = load_table(spark, SF_DIR, "events").select("user_id", "value", "event_id")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/b0")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/b1")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(
        "SELECT user_id, max_by(total_events, total_events) AS total_events "
        "FROM user_totals GROUP BY user_id"
    )
    expected = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    got = {r["user_id"]: r["total_events"] for r in out.collect()}
    exp = {r["user_id"]: r["n"] for r in expected.collect()}
    assert got == exp
    # state actually crossed batches: some user saw events in both files
    multi = spark.sql(
        "SELECT count(*) AS c FROM user_totals WHERE batch_events < total_events"
    ).collect()[0]["c"]
    assert multi > 0
    # the cross-batch value fold is EXACT (integer micro-units in
    # state): the final running sum must bit-match the batch
    # decimal-sum for every user, regardless of batch split
    val_out = spark.sql(
        "SELECT user_id, max_by(total_value, total_events) AS total_value "
        "FROM user_totals GROUP BY user_id"
    )
    val_exp = ev.groupBy("user_id").agg(
        (
            F.sum(
                (F.col("value").cast("decimal(20,6)") * 1_000_000).cast(
                    "long"
                )
            )
            / 1_000_000.0
        ).alias("v")
    )
    got_v = {r["user_id"]: r["total_value"] for r in val_out.collect()}
    exp_v = {r["user_id"]: r["v"] for r in val_exp.collect()}
    assert got_v == exp_v


# ----------------------------------------------- streaming file watch
def test_stream_watch_fires_on_fileset_change(spark, tmp_path):
    """The Flow-3 quickPoll analog as a REAL file-source stream: the
    watch must fire when (and only when) a new largest file lands in
    the watched directory."""
    import threading

    from pyspark.sql import functions as F

    from hbase_compact_spark.compaction.watch import current_argmax_file
    from hbase_compact_spark.streaming.watch import stream_until_changed

    d = str(tmp_path / "store")
    spark.range(1000).coalesce(1).write.parquet(d)
    before = current_argmax_file(spark, d)
    assert before is not None

    def land_bigger_file():
        (
            spark.range(100_000)
            .select("id", F.md5(F.col("id").cast("string")).alias("pad"))
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )

    t = threading.Timer(1.0, land_bigger_file)
    t.start()
    try:
        res = stream_until_changed(spark, d, before, budget_s=60.0)
    finally:
        t.join()
    assert res.changed
    assert res.final_argmax != before
    assert res.batches >= 1
    assert res.final_argmax == current_argmax_file(spark, d)


def test_stream_watch_reports_exhaustion_honestly(spark, tmp_path):
    """No file-set change within the budget -> changed=False (the
    reference soft-fails here, QHBaseCompact.java:71-72; we report)."""
    from hbase_compact_spark.compaction.watch import current_argmax_file
    from hbase_compact_spark.streaming.watch import stream_until_changed

    d = str(tmp_path / "store")
    spark.range(1000).coalesce(1).write.parquet(d)
    before = current_argmax_file(spark, d)
    res = stream_until_changed(spark, d, before, budget_s=3.0)
    assert not res.changed
    assert res.final_argmax == before


def test_stream_watch_retires_deleted_largest(spark, tmp_path):
    """Compaction deletes its inputs: when the pre-rewrite LARGEST
    file is removed and a smaller output lands, the watch must fire
    on the new largest LIVE file instead of pinning the deleted one
    as arg-max forever (which would burn the whole budget and report
    a file that no longer exists)."""
    import glob
    import os as _os
    import threading as _threading

    from pyspark.sql import functions as F

    from hbase_compact_spark.compaction.watch import current_argmax_file
    from hbase_compact_spark.streaming.watch import stream_until_changed

    d = str(tmp_path / "store")
    # two files: one big (the pre-compaction arg-max), one small
    (
        spark.range(50_000)
        .select("id", F.md5(F.col("id").cast("string")).alias("pad"))
        .coalesce(1)
        .write.mode("append")
        .parquet(d)
    )
    spark.range(100).coalesce(1).write.mode("append").parquet(d)
    for f in glob.glob(f"{d}/*"):
        if not f.endswith(".parquet"):
            _os.unlink(f)
    before = current_argmax_file(spark, d)

    def compact_like_rewrite():
        # delete the big input, land an output SMALLER than it
        sizes = {
            f: _os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet")
        }
        _os.unlink(max(sizes, key=sizes.get))
        spark.range(5_000).coalesce(1).write.mode("append").parquet(d)
        for f in glob.glob(f"{d}/*"):
            if not f.endswith(".parquet"):
                _os.unlink(f)

    t = _threading.Timer(1.5, compact_like_rewrite)
    t.start()
    try:
        res = stream_until_changed(spark, d, before, budget_s=60.0)
    finally:
        t.join()
    assert res.changed, "watch never fired after the arg-max was deleted"
    assert res.final_argmax != before
    assert res.final_argmax == current_argmax_file(spark, d)


def test_events_stream_reads_directory_layout(spark, tmp_path):
    """Real tables are DIRECTORIES of part files; the stream source
    must read them. Regression: pathGlobFilter('events.parquet') over
    the parent dir matches leaf files only, so a directory-layout
    events table silently streamed ZERO rows (found by the sf1 oracle
    sweep — every stream query returned empty at 10x)."""
    from hbase_compact_spark.streaming.tumbling import events_stream, run_bounded

    src = load_table(spark, "/root/testdata/sf0.001", "events")
    n = src.count()
    root = str(tmp_path / "sfdir")
    src.repartition(3).write.parquet(os.path.join(root, "events.parquet"))
    streamed = run_bounded(
        events_stream(spark, root).select("event_id"),
        mode="append",
        n_partitions=4,
    )
    assert streamed.count() == n


def test_stream_session_multibatch_append_equals_oracle(spark):
    """The registered stream_session must (a) run as a GENUINE multi-
    batch append-mode stream — at least two data micro-batches, the
    sentinel batch that drains the watermark, and the trailing
    no-data flush batch — and (b) have its
    union-of-per-batch-emissions equal both the batch lag/cumsum
    oracle and the documented Complete-mode fallback. Regression
    guard: an in-plan sentinel filter was once pushed below the
    aggregation into the scan, pruning the sentinel events and
    stalling the watermark (tail sessions silently missing)."""
    from hbase_compact_spark.registry import ORACLE
    from hbase_compact_spark.workload_streaming import (
        stream_session,
        stream_session_complete,
    )
    from tests.oracle_utils import assert_matches_oracle

    progress = []
    df = stream_session(spark, SF_DIR, progress=progress)
    rows = sorted(map(tuple, df.collect()))

    batches = [(p["batchId"], p["numInputRows"]) for p in progress]
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) >= 3, f"expected >=3 data batches: {batches}"
    # the two sentinel events must actually reach the watermark node
    # (a pushed-down filter would prune them at the scan: 0-row batch)
    assert sum(p["numInputRows"] for p in progress) == sum(
        r[2] for r in rows
    ) + 2, batches
    # and the trailing flush batch (no-data, sentinel-advanced
    # watermark) must have run — it emits the tail sessions
    assert any(p["numInputRows"] == 0 for p in progress), batches

    # oracle check BEFORE the fallback run: run_bounded results read
    # from a memory-sink view the NEXT bounded run drops (by contract)
    assert_matches_oracle(df, ORACLE["stream_session"], SF_DIR)
    fallback = sorted(
        map(tuple, stream_session_complete(spark, SF_DIR).collect())
    )
    assert rows == fallback


def test_stream_session_adversarial_boundaries(spark, tmp_path):
    """Hand-crafted worst-case events for the multi-batch session
    path: a gap of EXACTLY 30 min (Spark merges touching session
    windows, so it must EXTEND the session — the >= oracle rule this
    test originally carried disagreed with Spark here), a session
    spanning the quartile bucket boundary (must merge across
    micro-batches in the state store), duplicate timestamps, and a
    lone event at the global max ts (only the sentinel-driven flush
    can emit it). Compared against the lag/cumsum oracle on the same
    crafted table."""
    import datetime as dt

    import duckdb

    from hbase_compact_spark.registry import ORACLE
    from hbase_compact_spark.workload_streaming import stream_session
    from tests.oracle_utils import canonical_rows

    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)

    def ev(eid, uid, seconds, val):
        return (
            eid,
            t0 + dt.timedelta(seconds=seconds),
            uid,
            "view",
            float(val),
            "{}",
        )

    rows, eid = [], 0
    # u1: the EXACT-gap boundary. Spark's session_window merges
    # touching windows, so the event at +1800 s EXTENDS the session
    # (this very test exposed that the oracle's original >= split
    # rule disagreed with Spark at the boundary); the event 1801 s
    # later (strictly > gap) opens session two.
    for s in (0, 1800, 1800 + 1801):
        rows.append(ev(eid := eid + 1, 1, s, 1.5))
    # u2: a long session of events every 20 min across the whole time
    # range -> guaranteed to straddle every quartile/bucket boundary
    for k in range(30):
        rows.append(ev(eid := eid + 1, 2, k * 1200, 0.25))
    # u3: duplicate timestamps (3 events, same ts)
    for _ in range(3):
        rows.append(ev(eid := eid + 1, 3, 7200, 2.0))
    # u4: lone event at the global max ts (tail-flush probe)
    rows.append(ev(eid := eid + 1, 4, 30 * 1200 + 3600, 9.0))
    d = str(tmp_path / "advfix")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    out = stream_session(spark, d)
    pdf = out.toPandas()
    # u1 split at the exact gap; u2 one merged session; u3 one
    # 3-event session; u4 emitted despite being the last event
    per_user = pdf.groupby("user_id").size().to_dict()
    assert per_user == {1: 2, 2: 1, 3: 1, 4: 1}, per_user
    con = duckdb.connect()  # events-only view (crafted dir has no dims)
    con.execute(
        f"CREATE VIEW events AS SELECT * "
        f"FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    oracle_pdf = con.execute(ORACLE["stream_session"]).fetchdf()
    assert canonical_rows(pdf) == canonical_rows(oracle_pdf)


def test_stream_restart_recovery_no_dup_no_loss(spark):
    """Checkpoint recovery must be exact: run 1 (killed after the
    first half of the staged batches) and run 2 (restarted from the
    same checkpoint) together emit every session exactly once.
    Pins: (a) run 2's batch ids CONTINUE after run 1's — the restart
    resumed from recorded offsets instead of reprocessing; (b) run 2
    read only the files that arrived after the kill (no committed
    file re-read); (c) the per-run emission sets are DISJOINT (no
    session appended twice); (d) the union hash-matches the batch
    lag/cumsum oracle (assert_matches_oracle) — no losses."""
    from hbase_compact_spark.registry import ORACLE
    from hbase_compact_spark.workload_streaming import (
        stream_restart_recovery,
    )
    from tests.oracle_utils import assert_matches_oracle

    phases = []
    df = stream_restart_recovery(spark, SF_DIR, phases=phases)
    run1, run2, emissions = phases
    ids1 = [p["batchId"] for p in run1["progress"]]
    ids2 = [p["batchId"] for p in run2["progress"]]
    assert ids1 and ids2
    assert min(ids2) > max(ids1), (ids1, ids2)  # offsets resumed
    # no committed file re-read: every event enters exactly once
    n1 = sum(p["numInputRows"] for p in run1["progress"])
    n2 = sum(p["numInputRows"] for p in run2["progress"])
    total = load_table(spark, SF_DIR, "events").count()
    assert n1 + n2 == total + 2  # every event once, + 2 sentinels
    first = {(r["user_id"], r["session_start"]) for r in emissions["before_kill"]}
    second = {(r["user_id"], r["session_start"]) for r in emissions["restarted"]}
    assert first and second  # a genuine split across the kill
    assert not first & second  # nothing appended twice
    assert_matches_oracle(df, ORACLE["stream_restart_recovery"], SF_DIR)


def test_stream_dedup_bounded_state_eviction(spark):
    """dropDuplicatesWithinWatermark must (a) equal batch DISTINCT on
    the (user, epoch-day) key — every duplicate is <24 h from its
    first occurrence, inside the 25 h delay, so nothing re-emits —
    and (b) actually EVICT state as the watermark passes old days:
    the state-store row count at the final batch must be a small
    fraction of the all-time distinct keys (what global dropDuplicates
    would hold forever)."""
    from hbase_compact_spark.registry import ORACLE
    from hbase_compact_spark.workload_streaming import stream_dedup_bounded
    from tests.oracle_utils import assert_matches_oracle

    progress = []
    df = stream_dedup_bounded(spark, SF_DIR, progress=progress)
    assert_matches_oracle(df, ORACLE["stream_dedup_bounded"], SF_DIR)
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) >= 4  # genuinely multi-batch
    total_keys = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", F.date_trunc("DAY", "ts"))
        .distinct()
        .count()
    )
    state_rows = [
        int(so["numRowsTotal"])
        for p in progress
        for so in p.get("stateOperators", [])
        if "numRowsTotal" in so
    ]
    # state grew while the horizon filled, then eviction beat growth
    assert max(state_rows) < total_keys
    assert state_rows[-1] < max(state_rows) / 2, state_rows
    # and rows were genuinely evicted, not never-stored
    removed = sum(
        int(so.get("numRowsRemoved", 0))
        for p in progress
        for so in p.get("stateOperators", [])
    )
    assert removed > 0


def test_stream_late_data_accounting_exact(spark):
    """The late-data books must be EXACT, and in the metric's real
    unit: Spark's numRowsDroppedByWatermark counts post-partial-
    aggregation (window, user) group rows reaching the state
    operator, not raw input rows (the map-side combine folds the late
    batch first — discovered empirically, pinned here). So the metric
    must equal the distinct (6h-window, user) pairs of the late file,
    and no window from before the lagged watermark may appear in the
    emitted output."""
    import posixpath

    from hbase_compact_spark.workload_streaming import (
        late_stream_staging,
        stream_late_data,
    )

    out = stream_late_data(spark, SF_DIR).collect()[0]
    staging = late_stream_staging(spark, SF_DIR)
    late = spark.read.parquet(posixpath.join(staging, "batch_02.parquet"))
    n_late = late.count()
    # the books must follow the OBSERVED applied watermark, never the
    # staging assumption that the whole late file is below it
    wm = F.lit(out["watermark_applied"]).cast("timestamp")
    below = late.where(F.col("ts") < wm)
    n_below = below.count()
    n_groups_below = (
        below.select(F.window("ts", "6 hours"), "user_id").distinct().count()
    )
    assert out["n_late_rows"] == n_late
    assert out["n_late_dropped_rows"] == n_below
    assert out["n_late_groups_dropped"] == n_groups_below
    assert out["n_on_time"] == out["n_input"] - n_below
    # on THIS fixture the median-to-p75 gap exceeds the 1 h delay, so
    # the whole late file sits below the lagged watermark
    assert n_below == n_late
    assert n_late > 0 and n_groups_below > 0  # genuinely fired


def test_run_bounded_result_survives_later_runs(spark):
    """A run_bounded result must stay valid after LATER bounded runs
    on the same session. Regression: the result used to read a
    memory-sink temp view that the NEXT run_bounded call dropped, so
    a stale frame raised a bare TABLE_OR_VIEW_NOT_FOUND; the sink is
    now materialized (eager localCheckpoint) and its view dropped
    before returning, so no stream_out_* view outlives the call."""
    from hbase_compact_spark.streaming.tumbling import (
        events_stream,
        run_bounded,
        tumbling_counts,
    )

    first = run_bounded(
        tumbling_counts(events_stream(spark, SF_DIR)), n_partitions=4
    )
    n1 = first.count()
    second = run_bounded(
        tumbling_counts(events_stream(spark, SF_DIR)), n_partitions=4
    )
    # the first frame still evaluates, to the same rows as the rerun
    assert sorted(map(tuple, first.collect())) == sorted(
        map(tuple, second.collect())
    )
    assert first.count() == n1
    # and no memory-sink view leaks past its run_bounded call
    leaked = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("stream_out_")
    ]
    assert leaked == []


def test_run_bounded_timeout_drops_sink_view(spark):
    """Regression: the memory-sink temp view (and its driver-held
    rows) leaked on ERROR paths — dropTempView ran only on success.
    A timeout raise must still leave no stream_out_* view behind."""
    import pytest as _pytest

    from hbase_compact_spark.streaming.tumbling import (
        events_stream,
        run_bounded,
        tumbling_counts,
    )

    with _pytest.raises(RuntimeError, match="did not finish"):
        run_bounded(
            tumbling_counts(events_stream(spark, SF_DIR)),
            n_partitions=4,
            # smallest timeout awaitTermination accepts (>=1 ms after
            # the seconds->ms conversion) that a real multi-batch
            # availableNow run cannot possibly beat
            timeout=0.05,
        )
    leaked = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("stream_out_")
    ]
    assert leaked == []


def test_stream_static_join_adds_no_join_state(spark):
    """The stream-static join must hold NO streaming state for the
    static side — exactly one stateful operator (the windowed agg)
    appears in progress, and the result equals the batch dual."""
    from hbase_compact_spark.streaming.tumbling import (
        events_stream,
        run_bounded,
    )
    from hbase_compact_spark.tables import load_table

    ev = events_stream(spark, SF_DIR)
    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    agg = (
        ev.withWatermark("ts", "1 hour")
        .join(cust, "user_id")
        .groupBy(F.window("ts", "6 hours"), "segment")
        .agg(F.count("*").alias("n_events"))
        .select("window.start", "segment", "n_events")
    )
    progress: list = []
    got = run_bounded(agg, n_partitions=4, progress=progress)
    ops = [p for pr in progress for p in pr.get("stateOperators", [])]
    names = {op.get("operatorName") for op in ops}
    assert names == {"stateStoreSave"}, names  # agg only, no join state
    want = (
        load_table(spark, SF_DIR, "events")
        .join(cust, "user_id")
        .groupBy(F.window("ts", "6 hours"), "segment")
        .agg(F.count("*").alias("n_events"))
        .select("window.start", "segment", "n_events")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_heavy_stateful_queries_default_to_rocksdb(spark):
    """VERDICT r10 task 2: the heavy stateful queries (session
    windows — the one SCALE-flagged super-linear decade under the
    on-heap provider) must run under RocksDB ON THE DEFAULT CODE PATH
    (no context manager, no env), proven by the rocksdb custom
    metrics in the run's own progress; and the scoped provider conf
    must not leak into the session afterwards."""
    from hbase_compact_spark.streaming.tumbling import _PROVIDER_KEY
    from hbase_compact_spark.workload_streaming import stream_session

    assert spark.conf.get(_PROVIDER_KEY, None) is None  # clean session
    progress: list = []
    stream_session(spark, SF_DIR, progress=progress).collect()
    assert spark.conf.get(_PROVIDER_KEY, None) is None  # no leak
    assert any(
        any(k.startswith("rocksdb") for k in op.get("customMetrics", {}))
        for pr in progress
        for op in pr.get("stateOperators", [])
    ), "session-window state did not run under RocksDB by default"


def test_rocksdb_state_store_result_parity(spark):
    """The RocksDB state store (the 100 TB answer to the default
    provider's on-heap state — stream_session and
    stream_stateful_totals own the engine's worst cost-follows-input
    decades) must produce BIT-IDENTICAL results to the default
    HDFS-backed provider for both the sessionization state operator
    and the custom applyInPandasWithState fold, and the provider
    conf must not leak out of the scoping context manager."""
    from hbase_compact_spark.streaming.tumbling import (
        _PROVIDER_KEY,
        HDFS_PROVIDER,
        ROCKSDB_PROVIDER,
        state_store_provider,
    )
    from hbase_compact_spark.workload_streaming import (
        stream_session,
        stream_stateful_totals,
    )

    prev = spark.conf.get(_PROVIDER_KEY, None)
    # collect() before leaving each run: run_bounded's memory-sink
    # rows are localCheckpointed, so they survive the next run.
    # The baseline FORCES the HDFS-backed provider: these two queries
    # now default to RocksDB (run_bounded heavy_state), and an
    # explicit session-level provider must win over that default —
    # which this context also proves.
    with state_store_provider(spark, HDFS_PROVIDER):
        base_sess = sorted(
            map(tuple, stream_session(spark, SF_DIR).collect())
        )
        base_tot = sorted(
            map(tuple, stream_stateful_totals(spark, SF_DIR).collect())
        )
    with state_store_provider(spark, ROCKSDB_PROVIDER):
        assert spark.conf.get(_PROVIDER_KEY) == ROCKSDB_PROVIDER
        rock_sess = sorted(
            map(tuple, stream_session(spark, SF_DIR).collect())
        )
        rock_tot = sorted(
            map(tuple, stream_stateful_totals(spark, SF_DIR).collect())
        )
    assert spark.conf.get(_PROVIDER_KEY, None) == prev  # no leak
    assert rock_sess == base_sess
    assert rock_tot == base_tot


def test_stream_stream_outer_join_null_emission_semantics(spark):
    """The LEFT OUTER stream-stream join's contract, pinned three
    ways: (1) the bounded run equals the batch LEFT JOIN dual as a
    multiset — unmatched errors emit their null row EXACTLY once;
    (2) the nulls come from watermark-driven state EVICTION, not from
    the operator emitting eagerly — the same join over the raw
    single-batch stream (no watermark progression) produces ZERO null
    rows while the staged multi-batch run produces them all; (3) join
    state is watermark-bounded — eviction shrinks it below its peak
    by the final batch."""
    from pyspark.sql import functions as F

    from hbase_compact_spark.streaming.tumbling import (
        events_stream,
        run_bounded,
    )
    from hbase_compact_spark.tables import load_table
    from hbase_compact_spark.workload_streaming import (
        stream_stream_join_outer,
    )

    progress: list = []
    got = stream_stream_join_outer(spark, SF_DIR, progress=progress)
    got_rows = sorted(
        ((r["error_id"], r["click_id"], r["user_id"]) for r in got.collect()),
        key=lambda t: (t[0], t[1] is None, t[1] or 0),
    )

    ev = load_table(spark, SF_DIR, "events")
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("e_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    dual = e.join(
        c,
        F.expr(
            "c_user = user_id AND "
            "c_ts BETWEEN e_ts - INTERVAL 30 MINUTES AND e_ts"
        ),
        "left_outer",
    ).select("error_id", "click_id", "user_id")
    dual_rows = sorted(
        ((r["error_id"], r["click_id"], r["user_id"]) for r in dual.collect()),
        key=lambda t: (t[0], t[1] is None, t[1] or 0),
    )
    assert got_rows == dual_rows  # exactly once, nothing missing
    n_nulls = sum(1 for _, cid, _ in got_rows if cid is None)
    assert n_nulls > 0  # non-vacuous outer semantics

    # (2) nulls are produced by watermark passage, not eagerly: over
    # the raw single-batch stream the trailing no-data batch advances
    # the watermark only to max_ts - 1h, so errors inside that final
    # horizon are NEVER provably unmatched and their null rows go
    # missing — strictly fewer nulls than the batch dual. The staged
    # run's sentinels push the watermark past every real event, which
    # is exactly what recovers them (assertion (1) above).
    errors1 = (
        events_stream(spark, SF_DIR)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    clicks1 = (
        events_stream(spark, SF_DIR)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    single = run_bounded(
        errors1.join(
            clicks1,
            F.expr(
                "c_user = user_id AND "
                "c_ts BETWEEN e_ts - INTERVAL 30 MINUTES AND e_ts"
            ),
            "left_outer",
        ).select("error_id", "click_id", "user_id"),
        mode="append",
        n_partitions=4,
    )
    single_nulls = single.where(F.col("click_id").isNull()).count()
    assert 0 < single_nulls < n_nulls
    # the missing nulls are precisely tail-horizon errors: every
    # null the single-batch run DID emit is in the staged result too
    single_null_ids = {
        r["error_id"]
        for r in single.where(F.col("click_id").isNull()).collect()
    }
    staged_null_ids = {eid for eid, cid, _ in got_rows if cid is None}
    assert single_null_ids < staged_null_ids

    # (3) state bounded + eviction visible: the peak state row count
    # exceeds the final batch's (rows left the store), and even the
    # peak stays at stream size, not pair-mass size
    state_rows = [
        op["numRowsTotal"]
        for p in progress
        for op in p.get("stateOperators", [])
    ]
    assert state_rows and max(state_rows) > state_rows[-1]
    n_events = load_table(spark, SF_DIR, "events").count()
    assert max(state_rows) <= n_events + 8  # + sentinel pairs


def test_restart_recovery_under_rocksdb_changelog_checkpointing(spark):
    """Recovery is where RocksDB's checkpoint format actually differs
    from the default provider (changelog upload vs full-snapshot
    upload) — r9 proved parity only on uninterrupted runs. Re-run the
    kill/restart flow under RocksDB with changelog checkpointing
    enabled: the union of the two runs' emissions must equal the
    default provider's bit-for-bit (no duplicates, no losses across
    the restart), run 2 must RESTORE RocksDB state written by run 1
    (its progress carries rocksdb custom metrics and continues run
    1's batch ids), and neither conf may leak out."""
    from hbase_compact_spark.streaming.tumbling import (
        _PROVIDER_KEY,
        ROCKSDB_PROVIDER,
        state_store_provider,
    )
    from hbase_compact_spark.workload_streaming import (
        stream_restart_recovery,
    )

    base = sorted(
        map(tuple, stream_restart_recovery(spark, SF_DIR).collect())
    )
    ck_key = (
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled"
    )
    prev_ck = spark.conf.get(ck_key, None)
    spark.conf.set(ck_key, "true")
    phases: list = []
    try:
        with state_store_provider(spark, ROCKSDB_PROVIDER):
            rocks = sorted(
                map(
                    tuple,
                    stream_restart_recovery(
                        spark, SF_DIR, phases=phases
                    ).collect(),
                )
            )
    finally:
        if prev_ck is None:
            spark.conf.unset(ck_key)
        else:
            spark.conf.set(ck_key, prev_ck)
    assert spark.conf.get(ck_key, None) == prev_ck  # no leak
    assert spark.conf.get(_PROVIDER_KEY, None) is None or spark.conf.get(
        _PROVIDER_KEY
    ) != ROCKSDB_PROVIDER
    assert rocks == base
    # the RocksDB provider genuinely ran both phases: its custom
    # metrics appear in the progress of run 1 AND run 2 (run 2's
    # stores were REBUILT from run 1's checkpoint under changelog
    # mode), and run 2's batch ids continue run 1's
    by_phase = {
        p["phase"]: p["progress"] for p in phases if "progress" in p
    }
    assert set(by_phase) == {"before_kill", "restarted"}
    for tag in ("before_kill", "restarted"):
        ops = [
            op
            for pr in by_phase[tag]
            for op in pr.get("stateOperators", [])
        ]
        assert any(
            any(k.startswith("rocksdb") for k in op.get("customMetrics", {}))
            for op in ops
        ), f"RocksDB metrics absent in {tag}"
    ids1 = [pr["batchId"] for pr in by_phase["before_kill"]]
    ids2 = [pr["batchId"] for pr in by_phase["restarted"]]
    assert ids1 and ids2 and min(ids2) > max(ids1)
