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
