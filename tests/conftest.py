from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")


@pytest.fixture(scope="session")
def spark():
    from hbase_compact_spark.session import get_spark

    s = get_spark("hbase_compact_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # sf0.001 keeps the unit suite fast; oracle parity runs at sf0.01
    # in test_oracle_parity.py to mirror the driver.
    return "/root/testdata/sf0.001"


# ---------------------------------------------------------------------
# Fixture-memo prebuild (VERDICT r15 task 2): a cold /tmp makes the
# suite build ~55 fingerprint-keyed memos (snapshot-log tables, stream
# stagings, the ANN index, cluster labels) one at a time inside
# whichever test first touches each — the dominant share of the
# 38-minute cold wall time that truncated the driver's verify. Every
# build is an independent latency-bound sequence of small Spark jobs
# and driver-side commits, so overlapping them on a few driver threads
# recovers most of it (guide §2.6). The memo layer is already
# concurrency-safe (atomic publish, sources/memo.py) and each publisher
# is idempotent; failures here are swallowed — the owning test will
# simply build (or fail) exactly as before, so this fixture can never
# turn a green suite red.
#
# Deliberately EXCLUDED from the pool: publishers that RUN streaming
# queries (ingest/upsert/tail/cdc roots) — run_bounded's session-conf
# set/restore protocol is single-threaded by contract. The three
# batch stream-STAGING builders share load_events' scoped nanosAsLong
# flag, so they run as one serial lane inside the pool.

_SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def _prebuild_tasks(spark):
    from hbase_compact_spark import workload_compaction as wc
    from hbase_compact_spark import workload_llm as wl
    from hbase_compact_spark import workload_olap as wo
    from hbase_compact_spark import workload_streaming as ws

    both, sf01 = _SFS, (_SFS[1],)  # sf01 = sf0.01 only
    per_publisher = [
        (wc.snapshot_scan_root, both),
        (wc.zorder_scan_root, both),
        (wc.time_travel_root, both),
        (wc.delete_scan_root, both),
        (wc.mor_delete_scan_root, sf01),
        (wc.eqdelete_scan_root, sf01),
        (wc.rollback_scan_root, sf01),
        (wc.mor_upsert_scan_root, sf01),
        (wc.merge_scan_root, both),
        (wc.bloom_lookup_root, both),
        (wc.evolution_root, both),
        (wc.lifecycle_root, both),
        (wc.transform_scan_root, both),
        (wc.files_meta_root, both),
        (wc.sorted_scan_root, sf01),
        (wc.merge_full_root, sf01),
        (wc.manifests_meta_root, sf01),
        (wc.sql_read_root, sf01),
        (wc.sql_write_root, sf01),
        (wc.sql_merge_root, sf01),
        (wc._expire_base_root, both),
        (wc._partevol_root, both),
        (wc._compaction_staging, both + ("/root/testdata/sf0.1",)),
        (wl.cluster_labels_root, sf01),
        (wl.ann_index_root, both),
        (wo._bucketed_pair_root, sf01),
    ]
    tasks = []
    for fn, sfs in per_publisher:
        for sf in sfs:
            tasks.append((f"{fn.__name__}:{os.path.basename(sf)}", fn, sf))

    def _staging_lane():
        # serialized: these three share load_events' scoped
        # nanosAsLong set/restore
        for fn in (
            ws.join_stream_staging,
            ws.session_stream_staging,
            ws.late_stream_staging,
        ):
            for sf in both:
                fn(spark, sf)

    return tasks, _staging_lane


@pytest.fixture(scope="session", autouse=True)
def prebuild_memos(spark):
    if os.environ.get("HCS_PREBUILD_MEMOS", "1") == "0":
        yield
        return
    import time
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target as _itt

    t0 = time.time()
    tasks, staging_lane = _prebuild_tasks(spark)

    def _run(label, fn, sf):
        try:
            fn(spark, sf)
            return None
        except Exception as exc:  # best-effort: the owning test rebuilds
            return f"{label}: {type(exc).__name__}: {exc}"

    with ThreadPoolExecutor(max_workers=4) as pool:
        lane = pool.submit(_itt(staging_lane))
        futs = [
            pool.submit(_itt(lambda a=label, b=fn, c=sf: _run(a, b, c)))
            for label, fn, sf in tasks
        ]
        errs = [f.result() for f in futs]
        try:
            lane.result()
        except Exception:
            pass
    errs = [e for e in errs if e]
    print(
        f"\n[prebuild_memos] {len(tasks) + 6} builds in "
        f"{time.time() - t0:.1f}s ({len(errs)} deferred to tests)"
    )
    for e in errs[:10]:
        print(f"[prebuild_memos] deferred: {e}")
    yield
