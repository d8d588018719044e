"""Manifest-resolving consistent reads (compaction/reader.py): a
reader issued at ANY point inside a swap must see exactly one
committed file set — never the old+new mix a plain parquet read can
observe on an object store mid copy+delete."""

from __future__ import annotations

import os
import posixpath

import pytest
from pyspark.sql import functions as F

from hbase_compact_spark.compaction.executor import (
    SWAP_MANIFEST_NAME,
    _hadoop_fs,
    _write_json,
    list_partition_files,
)
from hbase_compact_spark.compaction.reader import (
    consistent_file_listing,
    partition_has_pending_swap,
    read_table_consistent,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def part_table(spark, tmp_path):
    from hbase_compact_spark.tables import load_table

    root = str(tmp_path / "table")
    ev = load_table(spark, SF_DIR, "events").drop("ts")
    for i, part in enumerate(["p0", "p1"]):
        (
            ev.filter(F.col("event_id") % 2 == i)
            .repartition(4)
            .write.mode("overwrite")
            .parquet(f"{root}/region={part}")
        )
    for dirpath, _, files in os.walk(root):
        for f in files:
            if not f.endswith(".parquet"):
                os.unlink(os.path.join(dirpath, f))
    return root


def _stage_swap(spark, root, rel, n_new_files):
    """Write-ahead manifest + staged tmp rewrite for one partition,
    renames NOT yet performed (the state right after the manifest
    lands)."""
    files = list_partition_files(spark, root)[rel]
    part_dir = posixpath.join(root, rel)
    tmp_dir = posixpath.join(root, "_compact_tmp_reader")
    spark.read.parquet(*[p for p, _ in files]).repartition(
        n_new_files
    ).write.mode("overwrite").parquet(tmp_dir)
    fs, _, jvm = _hadoop_fs(spark, root)
    Path = jvm.org.apache.hadoop.fs.Path
    new = [
        st.getPath()
        for st in fs.listStatus(Path(tmp_dir))
        if st.getPath().getName().endswith(".parquet")
    ]
    moves = [
        (str(p), str(Path(part_dir, f"compacted-rd-{i:05d}.parquet")))
        for i, p in enumerate(new)
    ]
    manifest = {
        "tmp_dir": tmp_dir,
        "rel": rel,
        "moves": moves,
        "old": [str(Path(p)) for p, _ in files],
        "trash_dir": None,
    }
    _write_json(fs, Path, Path(part_dir, SWAP_MANIFEST_NAME), manifest)
    return manifest, fs, Path


def _rows(spark, root):
    df = spark.read.parquet(root)
    return df.count(), df.agg(F.sum("event_id")).collect()[0][0]


def test_consistent_read_no_swap_equals_plain_read(spark, part_table):
    n, s = _rows(spark, part_table)
    df = read_table_consistent(spark, part_table)
    assert (df.count(), df.agg(F.sum("event_id")).collect()[0][0]) == (n, s)
    assert not partition_has_pending_swap(spark, f"{part_table}/region=p0")


def test_consistent_read_mid_move_sees_only_old(spark, part_table):
    n, s = _rows(spark, part_table)
    manifest, fs, Path = _stage_swap(spark, part_table, "region=p0", 2)
    # land exactly ONE of the two destinations: the mixed state a
    # non-atomic object-store rename exposes mid copy
    src, dest = manifest["moves"][0]
    assert fs.rename(Path(src), Path(dest))
    # a plain read now double-counts the landed file's rows
    plain = spark.read.parquet(part_table)
    assert plain.count() > n
    # the consistent reader resolves to the complete OLD side
    df = read_table_consistent(spark, part_table)
    assert (df.count(), df.agg(F.sum("event_id")).collect()[0][0]) == (n, s)
    assert partition_has_pending_swap(spark, f"{part_table}/region=p0")


def test_consistent_read_mid_retire_sees_only_new(spark, part_table):
    n, s = _rows(spark, part_table)
    manifest, fs, Path = _stage_swap(spark, part_table, "region=p0", 2)
    for src, dest in manifest["moves"]:
        assert fs.rename(Path(src), Path(dest))
    # crash mid-retirement: only the first old file got deleted
    assert fs.delete(Path(manifest["old"][0]), False)
    plain = spark.read.parquet(part_table)
    assert plain.count() > n  # old remnants + full new set = duplicates
    df = read_table_consistent(spark, part_table)
    assert (df.count(), df.agg(F.sum("event_id")).collect()[0][0]) == (n, s)


def test_consistent_listing_excludes_other_partitions_untouched(
    spark, part_table
):
    _stage_swap(spark, part_table, "region=p0", 2)
    files = consistent_file_listing(spark, part_table)
    p1 = [f for f in files if "region=p1" in f]
    assert len(p1) == 4  # untouched partition passes through intact
