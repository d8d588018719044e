"""Manifest-spill scaling contract (compaction/snapshots.py): the
snapshot JSON stays O(1) in file count, per-file metadata lives in
immutable parquet manifests, and pruning works identically through
the driver loop and the distributed manifest scan."""

from __future__ import annotations

import json
import os
import posixpath

import pytest

from hbase_compact_spark.compaction import snapshots as snap_mod
from hbase_compact_spark.compaction.snapshots import (
    SnapshotLog,
    scan_plan,
)

N_FILES = 10_000
ROWS_PER_FILE = 100


@pytest.fixture()
def big_log(spark, tmp_path):
    """A snapshot over 10⁴ SYNTHETIC file entries (pure metadata —
    commit never stats the filesystem) with disjoint per-file key
    ranges, the shape of a 100 TB table's manifest."""
    root = str(tmp_path / "big")
    os.makedirs(root, exist_ok=True)
    log = SnapshotLog(spark, root)
    files = [(f"part-{i:05d}.parquet", 1024 + i) for i in range(N_FILES)]
    stats = {
        rel: {
            "rows": ROWS_PER_FILE,
            "cols": {
                "k": [i * ROWS_PER_FILE, (i + 1) * ROWS_PER_FILE - 1]
            },
        }
        for i, (rel, _) in enumerate(files)
    }
    v = log.commit(files, op="synthetic", stats=stats)
    return log, v


def test_snapshot_json_is_o1_in_file_count(big_log, tmp_path):
    log, v = big_log
    json_path = posixpath.join(log.log_dir, f"v{v:012d}.json")
    size = os.path.getsize(json_path)
    assert size < 2048, f"snapshot JSON is {size} B for {N_FILES} files"
    payload = json.loads(open(json_path).read())
    assert "files" not in payload and "stats" not in payload
    assert payload["n_files"] == N_FILES
    assert payload["total_bytes"] == sum(
        1024 + i for i in range(N_FILES)
    )


def test_manifest_roundtrip_and_prune_10k(big_log):
    log, v = big_log
    files = log.files(v)
    assert len(files) == N_FILES
    stats = log.stats(v)
    assert len(stats) == N_FILES
    # range predicate hitting exactly 2 of the 10k disjoint files
    lo = 4_999 * ROWS_PER_FILE + 50
    hi = lo + ROWS_PER_FILE - 1  # spans files 4999 and 5000
    plan = scan_plan(log.spark, log.table_root, {"k": (lo, hi)}, v)
    assert plan["kept_files"] == 2
    assert plan["pruned_files"] == N_FILES - 2
    assert plan["paths"] == [
        "part-04999.parquet",
        "part-05000.parquet",
    ]


def test_distributed_prune_matches_driver_loop(big_log, monkeypatch):
    log, v = big_log
    lo = 1_234 * ROWS_PER_FILE
    hi = lo + 3 * ROWS_PER_FILE - 1  # files 1234, 1235, 1236
    driver = scan_plan(log.spark, log.table_root, {"k": (lo, hi)}, v)
    monkeypatch.setattr(snap_mod, "DISTRIBUTED_PRUNE_THRESHOLD", 100)
    dist = scan_plan(log.spark, log.table_root, {"k": (lo, hi)}, v)
    assert dist["paths"] == driver["paths"]
    assert dist["kept_files"] == 3
    assert dist["pruned_files"] == driver["pruned_files"]


def test_expire_reclaims_manifests(spark, tmp_path):
    from hbase_compact_spark.compaction.snapshots import expire_snapshots

    root = str(tmp_path / "t")
    os.makedirs(root)
    log = SnapshotLog(spark, root)
    for i in range(4):
        log.commit([(f"f{i}.parquet", 10)], op=f"c{i}")
    manifest_dir = log._manifest_local("")
    n_before = len(os.listdir(manifest_dir))
    assert n_before == 4
    expire_snapshots(spark, root, keep_last=2)
    assert len(os.listdir(manifest_dir)) == 2
    # survivors still resolve
    assert len(log.files()) == 1


def test_empty_table_bootstrap_roundtrip(spark, tmp_path):
    """commit_current over an EMPTY table writes a zero-row manifest
    (possibly a part-file-less directory) that must still resolve as
    an empty file set through every read accessor."""
    root = str(tmp_path / "empty")
    os.makedirs(root)
    log = SnapshotLog(spark, root)
    v = log.bootstrap()
    assert log.files(v) == []
    assert log.stats(v) == {}
    assert log.blooms(v) == {}
    snap = log.read(v)
    assert snap["n_files"] == 0 and snap["total_bytes"] == 0


# ---------------------------------------------------------------------
# shard_manifest (VERDICT r11 task 3): two-level metadata — manifest
# shards with recorded key bounds; scan_plan opens only surviving
# shards, so PLANNING cost scales with selectivity, not table size.


@pytest.fixture()
def sharded_log(spark, big_log):
    from hbase_compact_spark.compaction.snapshots import shard_manifest

    log, v = big_log
    v2 = shard_manifest(spark, log.table_root, "k", shards=10)
    return log, v, v2


def test_shard_index_is_o_shards_and_complete(sharded_log):
    log, v, v2 = sharded_log
    snap = log.read(v2)
    sh = snap["manifest_shards"]
    assert sh["by"] == "k"
    assert len(sh["parts"]) == 10
    assert sum(m[3] for m in sh["parts"].values()) == N_FILES
    # the shard index rides in the version JSON at O(shards) cost
    json_path = posixpath.join(log.log_dir, f"v{v2:012d}.json")
    assert os.path.getsize(json_path) < 8192
    # bounds are native ints from the same stats payload scan_plan
    # compares (a double round-trip would corrupt int64 bounds)
    for lo, hi, unbounded, nf in sh["parts"].values():
        assert isinstance(lo, int) and isinstance(hi, int)
        assert not unbounded and nf > 0
    # every accessor still reads the manifest whole
    assert len(log.files(v2)) == N_FILES
    assert {p for p, _ in log.files(v2)} == {p for p, _ in log.files(v)}


def test_shard_prune_opens_only_matching_shards(sharded_log, monkeypatch):
    """A narrow range query must open exactly the shards whose bounds
    overlap — rows of disjoint shards are NEVER read (pinned by
    intercepting the manifest part reads)."""
    log, v, v2 = sharded_log
    opened: list[str] = []
    orig = snap_mod._read_manifest_table

    def counting(path, columns=None):
        opened.append(posixpath.basename(path))
        return orig(path, columns)

    monkeypatch.setattr(snap_mod, "_read_manifest_table", counting)
    # files 4500/4501 sit inside ONE ntile shard (the deterministic
    # sharder tiles 10k files into 10 shards of exactly 1000)
    lo = 4_500 * ROWS_PER_FILE + 50
    hi = lo + ROWS_PER_FILE - 1
    plan = scan_plan(log.spark, log.table_root, {"k": (lo, hi)}, v2)
    assert plan["shards_total"] == 10
    assert plan["shards_opened"] == 1
    assert len(opened) == 1  # exactly one shard part file read
    # identical file-level result to the unsharded plan
    assert plan["paths"] == ["part-04500.parquet", "part-04501.parquet"]
    assert plan["pruned_files"] == N_FILES - 2
    # deterministic content-keyed sharding: names and bounds are
    # derivable from the stats alone (r13 — what makes
    # snapshot_manifests_meta oracle-checkable)
    sh = log.read(v2)["manifest_shards"]
    assert sorted(sh["parts"]) == [
        f"shard-{i:05d}.parquet" for i in range(10)
    ]
    for i in range(10):
        lo_i, hi_i, unb, nf = sh["parts"][f"shard-{i:05d}.parquet"]
        assert (lo_i, hi_i, unb, nf) == (
            i * 1000 * ROWS_PER_FILE,
            (i + 1) * 1000 * ROWS_PER_FILE - 1,
            False,
            1000,
        )


def test_shard_prune_distributed_branch_matches(sharded_log, monkeypatch):
    log, v, v2 = sharded_log
    lo = 1_234 * ROWS_PER_FILE
    hi = lo + 3 * ROWS_PER_FILE - 1
    driver = scan_plan(log.spark, log.table_root, {"k": (lo, hi)}, v2)
    monkeypatch.setattr(snap_mod, "DISTRIBUTED_PRUNE_THRESHOLD", 100)
    dist = scan_plan(log.spark, log.table_root, {"k": (lo, hi)}, v2)
    assert dist["paths"] == driver["paths"] == [
        "part-01234.parquet",
        "part-01235.parquet",
        "part-01236.parquet",
    ]
    assert dist["shards_opened"] == driver["shards_opened"] <= 2


def test_shard_prune_conservative_paths(sharded_log):
    """Predicates NOT on the shard key take the full-manifest path
    (no shards_opened in the result); a predicate the bounds cannot
    rule out keeps every shard — never a wrong prune."""
    log, v, v2 = sharded_log
    plan = scan_plan(log.spark, log.table_root, {"other": (1, 2)}, v2)
    assert "shards_opened" not in plan
    assert plan["kept_files"] == N_FILES  # no stats on 'other': keep all
    plan_all = scan_plan(
        log.spark, log.table_root, {"k": (None, None)}, v2
    )
    assert plan_all["shards_opened"] == plan_all["shards_total"]
    assert plan_all["kept_files"] == N_FILES


def test_shard_unbounded_files_always_kept(spark, tmp_path):
    """Files with no recorded stats for the shard key land in
    always-kept shards: sharding must never prune what stats cannot
    rule out."""
    from hbase_compact_spark.compaction.snapshots import shard_manifest

    root = str(tmp_path / "t2")
    os.makedirs(root)
    log = SnapshotLog(spark, root)
    files = [(f"part-{i:05d}.parquet", 1024) for i in range(100)]
    stats = {
        rel: {"rows": 10, "cols": {"k": [i * 10, i * 10 + 9]}}
        for i, (rel, _) in enumerate(files)
        if i % 7  # every 7th file has NO stats
    }
    log.commit(files, op="synthetic", stats=stats)
    v2 = shard_manifest(spark, root, "k", shards=4)
    sh = log.read(v2)["manifest_shards"]
    assert any(m[2] for m in sh["parts"].values())  # an unbounded shard
    plan = scan_plan(spark, root, {"k": (205, 215)}, v2)
    # the two covering files + every stats-less file survive
    kept = set(plan["paths"])
    assert "part-00020.parquet" in kept and "part-00021.parquet" in kept
    for i in range(0, 100, 7):
        assert f"part-{i:05d}.parquet" in kept


def test_append_after_shard_drops_stale_index(spark, tmp_path):
    """A later commit writes a fresh unsharded manifest — the stale
    shard bounds must NOT carry forward (they no longer cover the new
    files); scan_plan falls back to the full manifest and stays
    correct."""
    root = str(tmp_path / "t3")
    os.makedirs(root)
    log = SnapshotLog(spark, root)
    files = [(f"part-{i:05d}.parquet", 1024) for i in range(50)]
    stats = {
        rel: {"rows": 10, "cols": {"k": [i * 10, i * 10 + 9]}}
        for i, (rel, _) in enumerate(files)
    }
    log.commit(files, op="synthetic", stats=stats)
    from hbase_compact_spark.compaction.snapshots import shard_manifest

    v2 = shard_manifest(spark, root, "k", shards=4)
    v3 = log.commit_append([("late.parquet", 99)], op="append", parent=v2)
    snap3 = log.read(v3)
    assert "manifest_shards" not in snap3
    plan = scan_plan(spark, root, {"k": (100, 109)}, v3)
    # the stats-less appendee is conservatively kept alongside file 10
    assert set(plan["paths"]) == {"part-00010.parquet", "late.parquet"}


def test_table_manifests_meta(sharded_log, spark):
    """table$manifests: one row per manifest part with the shard
    bounds/counts from the version JSON — the operator view of the
    two-level layer; unsharded versions list parts with null bounds."""
    from hbase_compact_spark.compaction.snapshots import (
        table_manifests_meta,
    )

    log, v, v2 = sharded_log
    df = table_manifests_meta(spark, log.table_root, v2)
    rows = df.collect()
    assert len(rows) == 10
    assert all(r["shard_by"] == "k" for r in rows)
    assert sum(r["n_files"] for r in rows) == N_FILES
    assert all(
        r["bound_lo"] is not None and not r["always_kept"] for r in rows
    )
    assert all(r["size_bytes"] > 0 for r in rows)
    # shards tile the key domain in order
    spans = sorted(
        (int(r["bound_lo"]), int(r["bound_hi"])) for r in rows
    )
    assert spans[0][0] == 0
    assert spans[-1][1] == N_FILES * ROWS_PER_FILE - 1
    for (alo, ahi), (blo, bhi) in zip(spans, spans[1:]):
        assert ahi < blo  # disjoint, ordered
    # the pre-shard version: parts listed, bounds null
    df1 = table_manifests_meta(spark, log.table_root, v)
    r1 = df1.collect()
    assert len(r1) >= 1
    assert all(r["bound_lo"] is None and r["n_files"] is None for r in r1)
