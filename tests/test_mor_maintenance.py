"""Automatic MOR maintenance policy (VERDICT r10 task 4).

A CDC-style stream of upsert micro-batches grows one pending
equality-delete entry per batch; nothing else bounds the chain, and
every reader pays one extra join per entry. The daemon's MOR mode
(`DaemonConfig.mor_pending_max` → `snapshots.maintain_mor`) must keep
the chain bounded while reads stay exactly equal to the batch dual —
and must stay a metadata-only no-op below the thresholds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import hbase_compact_spark.compaction.snapshots as S
from hbase_compact_spark.compaction.daemon import DaemonConfig, run_daemon
from hbase_compact_spark.compaction.snapshots import (
    SnapshotLog,
    read_table_at,
)


def _seed(spark, tmp_path, n=60):
    root = str(tmp_path / "t")
    (
        spark.range(n)
        .selectExpr("id", "CAST(0 AS LONG) AS batch", "CAST(id AS DOUBLE) AS v")
        .repartitionByRange(3, "id")
        .write.parquet(root)
    )
    S.annotate_stats(spark, root, cols=["id"])
    return root


def _batch(spark, b: int, keys):
    return spark.createDataFrame(
        [(int(k), b, float(b * 1000 + k)) for k in keys],
        "id long, batch long, v double",
    )


def test_daemon_bounds_pending_chain_and_reads_stay_exact(spark, tmp_path):
    """Six upsert micro-batches with a maintenance pass after every
    batch (threshold 2): the chain length observed after each daemon
    cycle never exceeds the threshold, maintenance passes below the
    threshold are no-ops (no new version), and the final read equals
    the last-writer-wins dual of all batches."""
    root = _seed(spark, tmp_path)
    cfg = DaemonConfig(
        table_root=root,
        mor_pending_max=2,
        max_cycles=1,
        inter_partition_pause_s=0.0,
        cycle_pause_s=0.0,
    )
    log = SnapshotLog(spark, root)
    latest_state = {int(r["id"]): (0, float(r["id"])) for r in
                    spark.range(60).selectExpr("id").collect()}
    chain_after_cycle = []
    versions_spent_on_noops = []
    for b in range(1, 7):
        keys = [(b * 7 + i) % 60 for i in range(8)] + [100 + b]
        S.snapshot_upsert_mor(spark, root, _batch(spark, b, keys), ["id"])
        for k in keys:
            latest_state[k] = (b, float(b * 1000 + k))
        v_before = log.latest()
        run = run_daemon(spark, cfg)
        (cycle,) = run.cycles
        chain_after_cycle.append(cycle["pending_after"])
        if not cycle["triggered"]:
            versions_spent_on_noops.append(log.latest() - v_before)
    assert max(chain_after_cycle) <= 2, chain_after_cycle
    assert any(c == 0 for c in chain_after_cycle)  # a compact fired
    # below-threshold passes are METADATA-ONLY no-ops: zero commits
    assert versions_spent_on_noops and all(
        d == 0 for d in versions_spent_on_noops
    )
    got = {
        int(r["id"]): (int(r["batch"]), float(r["v"]))
        for r in read_table_at(spark, root).collect()
    }
    assert got == latest_state  # last-writer-wins dual, nothing lost


def test_age_policy_triggers_without_count_breach(spark, tmp_path):
    """A single pending entry (far below the count threshold) whose
    introducing commit is older than max_age_s must trigger; a young
    entry must not."""
    root = _seed(spark, tmp_path)
    S.snapshot_delete(spark, root, {"id": (5, 9)}, mode="mor")
    log = SnapshotLog(spark, root)
    assert len(log.delete_files(log.latest())) == 1
    young = S.maintain_mor(
        spark, root, max_pending=8, max_age_s=3600.0
    )
    assert not young["triggered"] and young["pending_after"] == 1
    old = S.maintain_mor(spark, root, max_pending=8, max_age_s=-1.0)
    assert old["triggered"] and old["pending_after"] == 0
    assert read_table_at(spark, root).count() == 55
    # physically applied: a fresh scan with no MOR info sees 55 rows
    assert (
        spark.read.parquet(
            *[f"{root}/{p}" for p, _ in log.files(log.latest())]
        ).count()
        == 55
    )


def test_maintain_mor_noop_shapes(spark, tmp_path):
    """Empty log dir and clean table: no trigger, no commit, sane
    result rows."""
    root = str(tmp_path / "t")
    spark.range(10).write.parquet(root)
    res = S.maintain_mor(spark, root)  # no snapshot log yet
    assert res == {
        "triggered": False,
        "pending_before": 0,
        "pending_after": 0,
        "version": None,
        "rewritten": 0,
    }
    log = SnapshotLog(spark, root)
    log.bootstrap()
    res2 = S.maintain_mor(spark, root, max_pending=0)
    assert not res2["triggered"] and res2["version"] == log.latest()


def test_choose_write_mode_policy(spark, tmp_path):
    """The COW-vs-MOR auto-policy (r14): a narrow keyed delete whose
    pruned rewrite bill fits the budget routes COW; a table-wide
    predicate priced over the budget routes MOR; standing pending
    pressure past the ratio flips back to COW regardless of bill.
    snapshot_delete(mode='auto') honors the decision end-to-end."""
    root = _seed(spark, tmp_path)
    # narrow predicate → 1 of 3 range files; tiny bytes → within any
    # sane budget → cow
    d = S.choose_write_mode(spark, root, {"id": (0, 3)})
    assert d["mode"] == "cow" and d["reason"] == "within_budget"
    assert d["touched_files"] == 1 and d["pending_entry_rows"] == 0
    # same predicate priced with an absurd $/GB and zero budget → mor
    d2 = S.choose_write_mode(
        spark, root, {"id": (0, 59)}, gb_seconds=1e12, cow_budget_s=0.0
    )
    assert d2["mode"] == "mor" and d2["reason"] == "over_budget"
    assert d2["touched_files"] == 3
    # auto delete routes through the decision: over-budget → a MOR
    # positional commit (zero rewrites), decision attached
    res = S.snapshot_delete(spark, root, {"id": (10, 11)}, mode="auto")
    assert res["auto_decision"]["mode"] == "cow"
    log = SnapshotLog(spark, root)
    assert log.read(log.latest())["op"] == "delete"  # cow rewrite
    # build pending pressure: MOR-delete a big slice (entry rows >
    # 5% of live rows) → the ratio flips the next decision to cow
    S.snapshot_delete(spark, root, {"id": (20, 40)}, mode="mor")
    d3 = S.choose_write_mode(
        spark, root, {"id": (50, 51)}, gb_seconds=1e12, cow_budget_s=0.0
    )
    assert d3["mode"] == "cow" and d3["reason"] == "pending_pressure"
    assert d3["pending_ratio"] > 0.05
    # and without pressure the same pricing said mor (d2) — the flip
    # is the ratio's doing, not the bill's


def test_maintain_mor_ratio_trigger(spark, tmp_path):
    """The ratio trigger: pending entry ROWS past max_pending_ratio of
    live rows compacts even when the chain is short; below it, no-op."""
    root = _seed(spark, tmp_path)
    S.snapshot_delete(spark, root, {"id": (5, 6)}, mode="mor")  # 2 rows
    low = S.maintain_mor(
        spark, root, max_pending=8, max_pending_ratio=0.10
    )
    assert not low["triggered"]  # 2/60 = 3.3% < 10%
    high = S.maintain_mor(
        spark, root, max_pending=8, max_pending_ratio=0.01
    )
    assert high["triggered"] and high["pending_after"] == 0


def test_daemon_auto_mode_chooses_per_table(spark, tmp_path):
    """auto_mode=True: a snapshot-logged table runs the MOR
    maintenance probe (maintain_mor result dicts in cycles); a plain
    directory table runs the in-place executor (CompactionReport)."""
    from hbase_compact_spark.compaction.executor import CompactionReport

    # snapshot-logged MOR table
    mor_root = _seed(spark, tmp_path)
    S.snapshot_delete(spark, mor_root, {"id": (5, 6)}, mode="mor")
    run = run_daemon(
        spark,
        DaemonConfig(
            table_root=mor_root,
            auto_mode=True,
            max_cycles=1,
            inter_partition_pause_s=0.0,
            cycle_pause_s=0.0,
        ),
    )
    (cycle,) = run.cycles
    assert isinstance(cycle, dict) and "pending_after" in cycle
    # plain directory table (no _snapshots log)
    plain_root = str(tmp_path / "plain")
    (
        spark.range(40)
        .selectExpr("id", "id % 4 AS part")
        .write.partitionBy("part")
        .parquet(plain_root)
    )
    run2 = run_daemon(
        spark,
        DaemonConfig(
            table_root=plain_root,
            auto_mode=True,
            max_cycles=1,
            inter_partition_pause_s=0.0,
            cycle_pause_s=0.0,
        ),
    )
    assert run2.cycles and all(
        isinstance(c, CompactionReport) for c in run2.cycles
    )
