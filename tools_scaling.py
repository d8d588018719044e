#!/usr/bin/env python
"""Scale rehearsal: generate ~sf1 (10x) and ~sf10 (100x) datasets
under /tmp and measure t(sfN)/t(sf0.1) for the shuffle-heaviest
queries — the observed-scaling evidence behind SCALING.md's plan-shape
claims. The sf10 decade turns the brief's "survives 100x" question
into a measured three-point curve (sf0.1 -> sf1 -> sf10).

    python tools_scaling.py generate        # build /tmp/hcs_scale/sf1
    python tools_scaling.py generate sf10   # build /tmp/hcs_scale/sf10
    python tools_scaling.py bench           # two-point sweep (sf0.1, sf1)
    python tools_scaling.py bench3 [qs] [N] # three-point sweep of the
                                            # state-heavy set -> SCALE_r{N}.json

Generation is DETERMINISTIC and referential-integrity-preserving:
fact/dim tables are replicated 10x with per-copy key offsets (so
join fan-outs stay 1:1 with the original), while documents and
embeddings are SYNTHESIZED fresh from xxhash64-seeded draws over the
fixture vocabulary — replicating text verbatim would turn the corpus
into a pathological 10-way-duplicate dedup input whose pair count
grows quadratically in copies, measuring the data, not the plan.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SRC_SF = "/root/testdata/sf0.1"
TARGETS = {  # label -> (copies vs sf0.1, output dir)
    "sf1": (10, "/tmp/hcs_scale/sf1"),
    "sf10": (100, "/tmp/hcs_scale/sf10"),
}
OUT_DIR = TARGETS["sf1"][1]
COPIES = TARGETS["sf1"][0]

# per-copy key offsets = max key + 1 of the sf0.1 fixture generation
OFFSETS = {
    "l_orderkey": 150_000,
    "o_orderkey": 150_000,
    "o_custkey": 15_000,
    "c_custkey": 15_000,
    "l_partkey": 20_000,
    "p_partkey": 20_000,
    "l_suppkey": 1_000,
    "s_suppkey": 1_000,
    "ps_partkey": 20_000,
    "event_id": 100_000,
    "user_id": 1_500,
}

# the shuffle-heaviest / most-expensive registered queries (BENCH r4
# top set) — the rehearsal sweep
REHEARSAL = [
    "groupby_stats",
    "rollup_total",
    "join_equi",
    "window_running",
    "percentile_dist",
    "sessionize",
    "interval_join",
    "asof_join",
    "dedup_exact",
    "dedup_fuzzy",
    "dedup_ngram_jaccard",
    "tfidf_top_terms",
    "token_heavy_hitters",
    "skew_salted_agg",
    "dedup_canonical",
    "length_outliers",
    "cooccurrence_pmi",
    "skew_salted_join",
    "stream_session",
    "compaction_execute",
    "funnel_conversion",
    "retention_cohorts",
    "stream_late_data",
]


def _spark() -> SparkSession:
    from hbase_compact_spark.session import get_spark

    return get_spark("scale_rehearsal")


def _replicate(spark: SparkSession, table: str, copies: int) -> "F.DataFrame":
    """`copies` copies with key-offset columns shifted per copy. Events go
    through tables.load_table so every fixture timestamp encoding
    that has ever shipped (TIMESTAMP(NANOS)-as-long, NTZ, plain)
    normalizes instead of crashing schema inference."""
    from hbase_compact_spark.tables import load_table

    if table == "events":
        df = load_table(spark, SRC_SF, "events")
    else:
        df = spark.read.parquet(f"{SRC_SF}/{table}.parquet")
    copy_ids = spark.range(copies).withColumnRenamed("id", "__copy")
    out = df.crossJoin(F.broadcast(copy_ids))
    for col in df.columns:
        if col in OFFSETS:
            out = out.withColumn(
                col, F.col(col) + F.col("__copy") * F.lit(OFFSETS[col])
            )
    return out.drop("__copy")


def generate(target: str = "sf1") -> None:
    copies, out_dir = TARGETS[target]
    scale_up = copies // 10  # partition counts grow with the decade
    spark = _spark()
    os.makedirs(out_dir, exist_ok=True)
    # dims stay fixture-sized (they would be broadcast at any scale)
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC_SF}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")
    for t in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        n_out = {"lineitem": 16, "orders": 8, "events": 8}.get(t, 4) * scale_up
        _replicate(spark, t, copies).repartition(n_out).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")

    # documents: synthesized from the fixture vocabulary, fresh draws
    src_docs = spark.read.parquet(f"{SRC_SF}/documents.parquet")
    n_docs = src_docs.count() * copies
    vocab = [
        r["w"]
        for r in src_docs.select(
            F.explode(F.split("text", " ")).alias("w")
        )
        .distinct()
        .collect()
    ]
    vocab_arr = F.array(*[F.lit(w) for w in sorted(vocab)])
    langs = F.array(*[F.lit(x) for x in ("de", "en", "es", "fr", "zh")])
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(
                        F.lit(0),
                        (F.pmod(F.xxhash64("id", F.lit(1)), 88) + 7).cast(
                            "int"
                        ),
                    ),
                    lambda p: F.element_at(
                        vocab_arr,
                        (
                            F.pmod(
                                F.xxhash64(F.col("doc_id"), p),
                                len(vocab),
                            )
                            + 1
                        ).cast("int"),
                    ),
                ),
            ).alias("text"),
            F.element_at(
                langs, (F.pmod(F.xxhash64("id", F.lit(2)), 5) + 1).cast("int")
            ).alias("lang"),
            F.concat(
                F.lit("src"), F.pmod(F.xxhash64("id", F.lit(3)), 20)
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    docs.repartition(8 * scale_up).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    # embeddings: 64-dim unit-range floats, xxhash-seeded
    n_vecs = (
        spark.read.parquet(f"{SRC_SF}/embeddings.parquet").count() * copies
    )
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda p: (
                F.pmod(F.xxhash64(F.col("vec_id"), p), 2000) / 1000.0 - 1.0
            ).cast("float"),
        ).alias("embedding"),
        F.pmod(F.xxhash64("id", F.lit(9)), 10).cast("int").alias("label"),
    )
    emb.repartition(4 * scale_up).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    print("generated", out_dir)


def bench(queries: list[str] | None = None, runs: int = 3) -> None:
    import __spark_entry__ as entrymod
    from hbase_compact_spark import registry

    spark = _spark()
    qs = entrymod.queries()
    names = queries or [q for q in REHEARSAL if q in qs]
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, dict] = {}
    for name in names:
        row: dict[str, float] = {}
        for label, sf_dir in (("sf0.1", SRC_SF), ("sf1", OUT_DIR)):
            ts = []
            for _ in range(runs):
                registry.clear_session_caches()
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts.append(time.perf_counter() - t0)
            row[label] = round(sorted(ts)[len(ts) // 2], 3)
        row["ratio"] = round(row["sf1"] / max(row["sf0.1"], 1e-9), 2)
        out[name] = row
        print(name, row, flush=True)
    print(json.dumps({"rehearsal": out}, separators=(",", ":")))


# the state-heavy / shuffle-heavy tail whose 10x ratios most deserve a
# second decade of evidence (VERDICT r6): the streaming state-store
# family plus the heaviest batch shapes
HEAVY3 = [
    "stream_tumbling",
    "stream_session",
    "stream_dedup",
    "stream_stateful_totals",
    "stream_stream_join",
    "stream_late_data",
    "dedup_ngram_jaccard",
    "compaction_execute",
    "percentile_dist",
    "skew_salted_join",
    # r8 additions: the corpus-scale line-dedup shuffle shape and the
    # end-to-end ingest->compact->read lifecycle
    "dedup_lines",
    "ingest_compact_lifecycle",
    # r8 second-half additions: the iterative-shuffle, star-join,
    # event-window, shingle-agg and map-only corruption shapes
    "pagerank_trade",
    "star_join",
    "scd2_dimension",
    "ngram_novelty",
    "mlm_span_corrupt",
    # r9 addition whose sf10 shape changed in r10 (salted split of
    # oversized clusters) + r10 additions: the MOR read anti-join,
    # the outer-join eviction path, and the maintained index read
    "dedup_semantic",
    "snapshot_mor_delete_scan",
    "stream_stream_join_outer",
    "ann_index_incremental",
    # r10 second-half additions: the equality-delete scoped-join read
    # and the one-commit MOR upsert read
    "snapshot_eqdelete_scan",
    "snapshot_mor_upsert_scan",
    # r11 addition: the transform-spec pruned read (days+bucket layout)
    "snapshot_transform_scan",
    # r12 additions: the full-clause-matrix MERGE and the snapshot-log
    # streaming tail (the per-trigger O(delta) claim has its own
    # table_tail section; this row tracks the end-to-end query)
    "snapshot_merge_full",
    "stream_table_tail",
    "stream_table_cdc",
]


def bench3(queries: list[str] | None = None, rnd: int | None = None) -> None:
    """Three-point sweep (sf0.1 / sf1 / sf10) of the state-heavy set;
    writes SCALE_r{N}.json next to the other round artifacts. sf0.1
    and sf1 run median-of-3; sf10 runs twice and records the WARM
    (second) time — at tens of seconds per query the first run's
    codegen/session warmup would otherwise dominate a 2-run median."""
    import __spark_entry__ as entrymod
    from hbase_compact_spark import registry

    if rnd is None:
        import glob as _g
        import re as _re

        rounds = [
            int(m.group(1))
            for p in _g.glob(str(Path(__file__).parent / "CORRECTNESS_r*.json"))
            if (m := _re.search(r"CORRECTNESS_r(\d+)\.json$", p))
        ]
        rnd = (max(rounds) + 1) if rounds else 1

    spark = _spark()
    qs = entrymod.queries()
    names = queries or [q for q in HEAVY3 if q in qs]
    points = [("sf0.1", SRC_SF, 3), ("sf1", TARGETS["sf1"][1], 3),
              ("sf10", TARGETS["sf10"][1], 2)]
    for label, d, _ in points[1:]:
        if not os.path.isdir(d):
            raise SystemExit(f"{label} missing — run generate first: {d}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, dict] = {}
    for name in names:
        row: dict[str, float] = {}
        for label, sf_dir, runs in points:
            ts = []
            for _ in range(runs):
                registry.clear_session_caches()
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts.append(time.perf_counter() - t0)
            row[label] = round(
                sorted(ts)[len(ts) // 2] if runs >= 3 else ts[-1], 3
            )
        row["ratio_10x"] = round(row["sf1"] / max(row["sf0.1"], 1e-9), 2)
        row["ratio_100x"] = round(row["sf10"] / max(row["sf0.1"], 1e-9), 2)
        row["decade2"] = round(row["sf10"] / max(row["sf1"], 1e-9), 2)
        out[name] = row
        print(name, row, flush=True)
    out_path = str(Path(__file__).parent / f"SCALE_r{rnd:02d}.json")
    # MERGE into any existing round artifact: a subset re-run must
    # update its rows, never clobber the other sections (provider_ab,
    # shard_planning, ...) or the full sweep's other query rows
    payload: dict = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            payload = json.load(f)
    payload["points"] = {"sf0.1": "median-of-3", "sf1": "median-of-3",
                         "sf10": "warm (2nd of 2 runs)"}
    payload["rows"] = {
        "lineitem": {"sf0.1": "600k", "sf1": "6M", "sf10": "60M"},
        "events": {"sf0.1": "100k", "sf1": "1M", "sf10": "10M"},
        "documents": {"sf0.1": "5k", "sf1": "50k", "sf10": "500k"},
    }
    payload.setdefault("queries", {}).update(out)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", out_path)


def bench3_rocksdb(queries: list[str] | None = None,
                   rnd: int | None = None) -> None:
    """Three-point sweep of the state-heaviest streaming queries under
    the RocksDB state store (the 100 TB answer to the default
    provider's on-heap state maps — VERDICT r8 task 2), merged into
    the round's SCALE_r{N}.json under a 'rocksdb_variants' key so the
    two providers' curves sit side by side. Result parity with the
    default provider is pinned separately in
    tests/test_daemon_streaming.py::test_rocksdb_state_store_result_parity."""
    import __spark_entry__ as entrymod
    from hbase_compact_spark import registry
    from hbase_compact_spark.streaming.tumbling import (
        ROCKSDB_PROVIDER,
        state_store_provider,
    )

    if rnd is None:
        import glob as _g
        import re as _re

        rounds = [
            int(m.group(1))
            for p in _g.glob(str(Path(__file__).parent / "SCALE_r*.json"))
            if (m := _re.search(r"SCALE_r(\d+)\.json$", p))
        ]
        rnd = max(rounds) if rounds else 1

    spark = _spark()
    qs = entrymod.queries()
    names = queries or ["stream_session", "stream_stateful_totals"]
    points = [("sf0.1", SRC_SF, 3), ("sf1", TARGETS["sf1"][1], 3),
              ("sf10", TARGETS["sf10"][1], 2)]
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, dict] = {}
    with state_store_provider(spark, ROCKSDB_PROVIDER):
        for name in names:
            row: dict[str, float] = {}
            for label, sf_dir, runs in points:
                ts = []
                for _ in range(runs):
                    registry.clear_session_caches()
                    t0 = time.perf_counter()
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    ts.append(time.perf_counter() - t0)
                row[label] = round(
                    sorted(ts)[len(ts) // 2] if runs >= 3 else ts[-1], 3
                )
            row["ratio_10x"] = round(row["sf1"] / max(row["sf0.1"], 1e-9), 2)
            row["decade2"] = round(row["sf10"] / max(row["sf1"], 1e-9), 2)
            out[name] = row
            print("rocksdb", name, row, flush=True)
    out_path = str(Path(__file__).parent / f"SCALE_r{rnd:02d}.json")
    payload = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            payload = json.load(f)
    payload["rocksdb_variants"] = {
        "provider": ROCKSDB_PROVIDER,
        "note": "same bounded-stream queries re-run under RocksDB; "
        "result parity with the default provider is pinned in "
        "tests/test_daemon_streaming.py",
        "queries": out,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("merged rocksdb_variants into", out_path)


def bench_provider_ab(rnd: int | None = None) -> None:
    """Default-path (RocksDB via run_bounded heavy_state) vs a forced
    HDFS-provider session override for the two state-heaviest
    queries, at three scale points — the per-box data point the
    provider-default decision tracks (r10's box favored RocksDB 2.5x
    at sf10, r11's favored HDFS 1.3x; judge asked for a third)."""
    import __spark_entry__ as entrymod
    from hbase_compact_spark import registry
    from hbase_compact_spark.streaming.tumbling import (
        HDFS_PROVIDER,
        state_store_provider,
    )

    if rnd is None:
        rnd = 1
    spark = _spark()
    qs = entrymod.queries()
    names = ["stream_session", "stream_stateful_totals"]
    points = [("sf0.1", SRC_SF, 3), ("sf1", TARGETS["sf1"][1], 3),
              ("sf10", TARGETS["sf10"][1], 2)]
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _run(name, sf_dir, runs):
        ts = []
        for _ in range(runs):
            registry.clear_session_caches()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
        return round(sorted(ts)[len(ts) // 2] if runs >= 3 else ts[-1], 3)

    out: dict[str, dict] = {n: {} for n in names}
    for label, sf_dir, runs in points:
        for name in names:
            default_s = _run(name, sf_dir, runs)  # heavy_state default
            with state_store_provider(spark, HDFS_PROVIDER):
                hdfs_s = _run(name, sf_dir, runs)
            out[name][label] = {
                "default_rocksdb": default_s,
                "forced_hdfs": hdfs_s,
            }
            print("provider_ab", name, label, out[name][label], flush=True)
    out_path = str(Path(__file__).parent / f"SCALE_r{rnd:02d}.json")
    payload = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            payload = json.load(f)
    payload["provider_ab"] = {
        "what": ("heavy stateful queries on the DEFAULT code path "
                 "(RocksDB via run_bounded heavy_state) vs an explicit "
                 "HDFS-provider session override; result parity pinned "
                 "in test_daemon_streaming.py"),
        "points": out,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("merged provider_ab into", out_path)


def bench_tail(rnd: int | None = None) -> None:
    """stream_table_tail O(delta) evidence: at two table scales, time
    (a) a full tail from scratch (serves the whole table) and (b) a
    checkpoint-resumed tail after ONE fixed-size append (serves only
    the delta). The full tail grows with the table; the delta batch
    must stay ~flat — per-trigger cost is O(delta files), not
    O(table)."""
    import shutil
    import tempfile

    from hbase_compact_spark.compaction.snapshots import (
        SnapshotLog,
        append_partitioned,
    )
    from hbase_compact_spark.streaming.table_tail import tail_stream
    from hbase_compact_spark.tables import load_table

    spark = _spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # warm the python data-source worker pool on a throwaway table so
    # the first timed drain measures the tail, not process startup
    warm_base = tempfile.mkdtemp(prefix="hcs_tailwarm_")
    warm_root = os.path.join(warm_base, "t")
    spark.range(100).write.parquet(warm_root)
    SnapshotLog(spark, warm_root).bootstrap()
    wq = (
        tail_stream(spark, warm_root)
        .writeStream.format("noop")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(warm_base, "ckpt"))
        .start()
    )
    wq.awaitTermination(120)
    shutil.rmtree(warm_base, ignore_errors=True)
    out: dict[str, dict] = {}
    delta_rows = 20_000
    for label, sf_dir in [("sf0.1", SRC_SF), ("sf1", TARGETS["sf1"][1]),
                          ("sf10", TARGETS["sf10"][1])]:
        base = tempfile.mkdtemp(prefix=f"hcs_tailbench_{label}_")
        root = os.path.join(base, "t")
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        n_total = ev.count()
        ev.repartition(32).write.parquet(root)
        SnapshotLog(spark, root).bootstrap()
        ckpt = os.path.join(base, "ckpt")

        def _drain() -> float:
            t0 = time.perf_counter()
            q = (
                tail_stream(spark, root)
                .writeStream.format("noop")
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination(600)
            return round(time.perf_counter() - t0, 3)

        full_s = _drain()
        delta = ev.limit(delta_rows).selectExpr(
            "event_id + 1000000000 AS event_id",
            "user_id",
            "event_type",
            "value",
        )
        append_partitioned(spark, root, delta)
        delta_s = _drain()
        out[label] = {
            "rows_total": int(n_total),
            "full_tail_s": full_s,
            "delta_rows": delta_rows,
            "delta_tail_s": delta_s,
        }
        print("tail", label, out[label], flush=True)
        shutil.rmtree(base, ignore_errors=True)
    out_path = str(Path(__file__).parent / f"SCALE_r{rnd:02d}.json")
    payload = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            payload = json.load(f)
    payload["table_tail"] = {
        "what": ("snapshot-tail per-trigger cost: full drain (whole "
                 "table) vs checkpoint-resumed drain of one fixed "
                 "20k-row append - the delta batch must stay ~flat as "
                 "the table grows 10x (O(delta files), not O(table))"),
        "points": out,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("merged table_tail into", out_path)


def bench_shard_planning(rnd: int | None = None) -> None:
    """shard_manifest planning-cost evidence: synthetic manifests of
    10^4 and 10^5 file entries (pure metadata, disjoint key ranges),
    a narrow 2-file range probe timed unsharded vs sharded (32
    shards). The sharded plan opens only the covering shard, so
    planning latency drops and stays ~flat with file count at fixed
    selectivity."""
    import shutil
    import tempfile

    from hbase_compact_spark.compaction.snapshots import (
        SnapshotLog,
        scan_plan,
        shard_manifest,
    )

    spark = _spark()
    out: dict[str, dict] = {}
    for n_files in (10_000, 100_000):
        base = tempfile.mkdtemp(prefix=f"hcs_shardbench_{n_files}_")
        root = os.path.join(base, "t")
        os.makedirs(root, exist_ok=True)
        log = SnapshotLog(spark, root)
        files = [(f"part-{i:06d}.parquet", 1024) for i in range(n_files)]
        stats = {
            rel: {"rows": 100, "cols": {"k": [i * 100, i * 100 + 99]}}
            for i, (rel, _) in enumerate(files)
        }
        v1 = log.commit(files, op="synthetic", stats=stats)
        v2 = shard_manifest(spark, root, "k", shards=32)
        lo = (n_files // 2) * 100 + 50
        probe = {"k": (lo, lo + 149)}  # spans exactly 2 files

        def _median(version):
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                plan = scan_plan(spark, root, probe, version)
                ts.append(time.perf_counter() - t0)
                assert plan["kept_files"] == 2, plan["kept_files"]
            return round(sorted(ts)[2], 4)

        flat_s = _median(v1)
        shard_plan = scan_plan(spark, root, probe, v2)
        sharded_s = _median(v2)
        out[str(n_files)] = {
            "flat_plan_s": flat_s,
            "sharded_plan_s": sharded_s,
            "shards_opened": shard_plan["shards_opened"],
            "shards_total": shard_plan["shards_total"],
        }
        print("shard_planning", n_files, out[str(n_files)], flush=True)
        shutil.rmtree(base, ignore_errors=True)
    out_path = str(Path(__file__).parent / f"SCALE_r{rnd:02d}.json")
    payload = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            payload = json.load(f)
    payload["shard_planning"] = {
        "what": ("scan_plan latency for a 2-file range probe over "
                 "synthetic manifests, flat vs 32-way sharded "
                 "(median of 5): sharded planning opens only the "
                 "covering shard and stays ~flat with file count"),
        "points": out,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("merged shard_planning into", out_path)


def bench_index_maintenance(rnd: int | None = None) -> None:
    """Rebuild-vs-increment cost of the persistent IVF index (VERDICT
    r9 task 5's 'Done' clause): at each scale point, time (a) a FULL
    build over base+delta embeddings and (b) an INCREMENTAL extend of
    a 10% delta against the persisted base index. Merged into
    SCALE_r{N}.json under 'index_maintenance'. The increment should
    cost O(|delta|) — flat-ish across the decades relative to the
    rebuild's corpus-linear growth."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hbase_compact_spark.functions.similarity import (
        build_ivf_index,
        extend_ivf_index,
    )
    from hbase_compact_spark.tables import load_table

    if rnd is None:
        raise SystemExit("pass the round number")
    spark = _spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    points = [("sf0.1", SRC_SF), ("sf1", TARGETS["sf1"][1]),
              ("sf10", TARGETS["sf10"][1])]
    out: dict[str, dict] = {}
    for label, sf_dir in points:
        if not os.path.isdir(sf_dir):
            continue
        base = load_table(spark, sf_dir, "embeddings")
        n = base.count()
        delta = (
            base.where(F.pmod(F.col("vec_id"), 10) == 0)
            .select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"),
                F.reverse("embedding").alias("embedding"),
                "label",
            )
        )
        work = tempfile.mkdtemp(prefix="hcs_idx_")
        try:
            t0 = time.perf_counter()
            build_ivf_index(spark, base, os.path.join(work, "base"))
            t_base = time.perf_counter() - t0
            t0 = time.perf_counter()
            res = extend_ivf_index(spark, delta, os.path.join(work, "base"))
            t_incr = time.perf_counter() - t0
            assert res["mode"] == "incremental", res
            full = base.unionByName(delta)
            t0 = time.perf_counter()
            build_ivf_index(spark, full, os.path.join(work, "full"))
            t_rebuild = time.perf_counter() - t0
        finally:
            shutil.rmtree(work, ignore_errors=True)
        out[label] = {
            "n_base": int(n),
            "base_build_s": round(t_base, 3),
            "increment_s": round(t_incr, 3),
            "full_rebuild_s": round(t_rebuild, 3),
            "increment_vs_rebuild": round(t_incr / max(t_rebuild, 1e-9), 3),
        }
        print(label, out[label], flush=True)
    out_path = str(Path(__file__).parent / f"SCALE_r{rnd:02d}.json")
    payload = json.load(open(out_path)) if os.path.exists(out_path) else {}
    payload["index_maintenance"] = {
        "what": ("persistent IVF index: full build vs O(delta) extend "
                 "(10% delta, frozen persisted centroids) vs full "
                 "rebuild over base+delta"),
        "points": out,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("merged index_maintenance into", out_path)


def bench_recovery_rocksdb(rnd: int | None = None) -> None:
    """stream_restart_recovery wall time: default provider vs RocksDB
    with changelog checkpointing, per scale point (VERDICT r9 task 6's
    'Done' clause). Result parity across the kill/restart is pinned in
    tests/test_daemon_streaming.py; this records the cost curves side
    by side under 'recovery_variants'."""
    import __spark_entry__ as entrymod
    from hbase_compact_spark import registry
    from hbase_compact_spark.streaming.tumbling import (
        ROCKSDB_PROVIDER,
        state_store_provider,
    )

    if rnd is None:
        raise SystemExit("pass the round number")
    spark = _spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    name = "stream_restart_recovery"
    ck_key = (
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled"
    )
    points = [("sf0.1", SRC_SF, 3), ("sf1", TARGETS["sf1"][1], 3),
              ("sf10", TARGETS["sf10"][1], 2)]
    out: dict[str, dict] = {}
    for label, sf_dir, runs in points:
        if not os.path.isdir(sf_dir):
            continue
        row: dict[str, float] = {}
        for variant in ("default", "rocksdb_changelog"):
            ts = []
            for _ in range(runs):
                registry.clear_session_caches()
                t0 = time.perf_counter()
                if variant == "default":
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                else:
                    prev = spark.conf.get(ck_key, None)
                    spark.conf.set(ck_key, "true")
                    try:
                        with state_store_provider(spark, ROCKSDB_PROVIDER):
                            qs[name](spark, sf_dir).write.format(
                                "noop"
                            ).mode("overwrite").save()
                    finally:
                        if prev is None:
                            spark.conf.unset(ck_key)
                        else:
                            spark.conf.set(ck_key, prev)
                ts.append(time.perf_counter() - t0)
            row[variant] = round(
                sorted(ts)[len(ts) // 2] if runs >= 3 else ts[-1], 3
            )
        out[label] = row
        print(label, row, flush=True)
    out_path = str(Path(__file__).parent / f"SCALE_r{rnd:02d}.json")
    payload = json.load(open(out_path)) if os.path.exists(out_path) else {}
    payload["recovery_variants"] = {
        "what": ("stream_restart_recovery (two checkpointed runs + "
                 "kill/restart) under the default provider vs RocksDB "
                 "with changelog checkpointing; parity pinned in "
                 "test_daemon_streaming.py"),
        "points": out,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("merged recovery_variants into", out_path)


def bench_mor_maintenance(rnd: int | None = None) -> None:
    """The task-4 'Done' SCALE row: read cost as CDC upsert batches
    accumulate, WITH the daemon's MOR maintenance (chain bounded at 3
    pending entries) vs WITHOUT (chain grows one equality entry per
    batch). Each point = warm read (2nd of 2 noop-write scans) of the
    table's latest snapshot after batch k. The claim being measured:
    maintained read cost stays ~flat while unmaintained cost grows
    with chain length — the policy converts an O(batches) read tax
    into a bounded one."""
    import shutil
    import tempfile

    import hbase_compact_spark.compaction.snapshots as S

    if rnd is None:
        raise SystemExit("pass the round number")
    spark = _spark()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    N, BATCH, K = 2_000_000, 50_000, 10

    def _build(tag: str) -> str:
        root = os.path.join(tempfile.gettempdir(), f"hcs_mormaint_{tag}")
        shutil.rmtree(root, ignore_errors=True)
        (
            spark.range(N)
            .selectExpr("id", "CAST(0 AS LONG) AS batch", "CAST(id AS DOUBLE) AS v")
            .repartitionByRange(16, "id")
            .write.parquet(root)
        )
        S.annotate_stats(spark, root, cols=["id"])
        return root

    def _read_sec(root: str) -> float:
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            S.read_table_at(spark, root).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
        return round(ts[-1], 3)

    out: dict[str, list] = {}
    for tag, maintain in (("unmaintained", False), ("maintained", True)):
        root = _build(tag)
        curve = []
        for b in range(1, K + 1):
            batch = spark.range(BATCH).selectExpr(
                f"(id * 37 + {b * 101}) % {N} AS key_mod"
            ).selectExpr(
                "key_mod AS id",
                f"CAST({b} AS LONG) AS batch",
                "CAST(key_mod AS DOUBLE) AS v",
            ).dropDuplicates(["id"])
            S.snapshot_upsert_mor(spark, root, batch, ["id"])
            res = None
            if maintain:
                log0 = S.SnapshotLog(spark, root)
                total = sum(s for _, s in log0.files(log0.latest()))
                # keep ~16 output files: at fixture scale the default
                # 128 MB target would collapse the table into ONE
                # file and strangle scan parallelism — production
                # tables keep the default because their partitions
                # exceed it
                res = S.maintain_mor(
                    spark, root, max_pending=3,
                    target_bytes=max(1, total // 16),
                )
            log = S.SnapshotLog(spark, root)
            curve.append(
                {
                    "batch": b,
                    "pending_entries": len(log.delete_files(log.latest())),
                    "read_sec": _read_sec(root),
                    "compacted": bool(res and res["triggered"]),
                }
            )
            print(tag, curve[-1], flush=True)
        out[tag] = curve
        shutil.rmtree(root, ignore_errors=True)
    out_path = str(Path(__file__).parent / f"SCALE_r{rnd:02d}.json")
    payload = json.load(open(out_path)) if os.path.exists(out_path) else {}
    payload["mor_maintenance"] = {
        "what": (f"read cost after each of {K} CDC upsert batches "
                 f"({BATCH} keys into a {N}-row table), daemon MOR "
                 "maintenance (max_pending=3) vs none; warm 2nd-read "
                 "seconds"),
        "curves": out,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("merged mor_maintenance into", out_path)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "bench"
    if cmd == "generate":
        generate(sys.argv[2] if len(sys.argv) > 2 else "sf1")
    elif cmd == "bench":
        qlist = sys.argv[2].split(",") if len(sys.argv) > 2 else None
        bench(qlist)
    elif cmd == "bench3":
        qlist = (
            sys.argv[2].split(",")
            if len(sys.argv) > 2 and sys.argv[2] != "-"
            else None
        )
        rnd = int(sys.argv[3]) if len(sys.argv) > 3 else None
        bench3(qlist, rnd)
    elif cmd == "bench3_rocksdb":
        qlist = (
            sys.argv[2].split(",")
            if len(sys.argv) > 2 and sys.argv[2] != "-"
            else None
        )
        rnd = int(sys.argv[3]) if len(sys.argv) > 3 else None
        bench3_rocksdb(qlist, rnd)
    elif cmd == "bench_index":
        bench_index_maintenance(int(sys.argv[2]))
    elif cmd == "bench_recovery":
        bench_recovery_rocksdb(int(sys.argv[2]))
    elif cmd == "bench_mor":
        bench_mor_maintenance(int(sys.argv[2]))
    elif cmd == "bench_provider_ab":
        bench_provider_ab(int(sys.argv[2]))
    elif cmd == "bench_tail":
        bench_tail(int(sys.argv[2]))
    elif cmd == "bench_shard_planning":
        bench_shard_planning(int(sys.argv[2]))
    else:
        raise SystemExit(f"unknown command {cmd!r}")
