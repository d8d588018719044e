"""Batch DataSource-V2 read path (sources/snapshot_table.py): plain
Spark SQL over snapshot-logged tables with scan_plan pruning intact —
pushdown-driven file pruning, sharded-manifest open discipline,
version/ref time travel, MOR delete subtraction, schema evolution."""

from __future__ import annotations

import os
import posixpath

import pytest
from pyspark.sql import functions as F

from hbase_compact_spark.compaction import snapshots as snap_mod
from hbase_compact_spark.compaction.snapshots import (
    PureSnapshotLog,
    SnapshotLog,
    annotate_stats,
    read_table_at,
    read_table_where,
    scan_plan,
    snapshot_delete,
    snapshot_delete_by_key,
)
from hbase_compact_spark.sources.snapshot_table import (
    SnapshotTableReader,
    read_table,
    register,
    table_schema,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def table(spark, tmp_path):
    """A logged table with stats, a tag, MOR eq+pos deletes, and a
    post-tag append — every read feature in one fixture."""
    root = str(tmp_path / "t")
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("g"),
        F.format_string("v-%04d", F.col("id")).alias("v"),
    )
    (
        df.filter("k < 800")
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k")
        .write.parquet(root)
    )
    log = SnapshotLog(spark, root)
    log.bootstrap()
    annotate_stats(spark, root, cols=["k"])
    log.set_ref("pre", log.latest(), kind="tag")
    # MOR equality delete (k % 97 == 0) + positional delete (g == 3)
    snapshot_delete_by_key(
        spark, root, df.filter("k < 800 AND k % 97 = 0").select("k")
    )
    snapshot_delete(spark, root, {"g": 3}, mode="mor")
    df.filter("k >= 800").repartition(2).write.parquet(
        posixpath.join(root, "more")
    )
    log.commit_current(op="append", parent=log.latest())
    return root, log


def test_format_matches_helper_reads(spark, table):
    root, log = table
    assert _rows(read_table(spark, root)) == _rows(read_table_at(spark, root))
    assert _rows(read_table(spark, root, ref="pre")) == _rows(
        read_table_at(spark, root, version="pre")
    )
    assert _rows(read_table(spark, root, version=2)) == _rows(
        read_table_at(spark, root, version=2)
    )
    # MOR really subtracted: eq-deleted keys and pos-deleted group gone
    live = read_table(spark, root)
    assert live.filter("k < 800 AND k % 97 = 0").count() == 0
    assert live.filter("g = 3 AND k < 800").count() == 0
    # appended rows are OUTSIDE the eq entry's scope and survive intact
    assert live.filter("k >= 800").count() == 200


def test_pushdown_prunes_files(spark, table):
    root, log = table
    reader = SnapshotTableReader(
        table_schema(root), {"path": root, "version": "2"}
    )
    reader._preds = {"k": (100, 199)}
    plan, parts = reader.plan()
    assert plan["kept_files"] == 1 and plan["pruned_files"] == 7
    assert len(parts) == 1
    # end-to-end through SQL: pushdown reaches the same planner and
    # the result equals the helper read (exact filter re-applied)
    got = read_table(spark, root, version=2).filter(
        (F.col("k") >= 100) & (F.col("k") <= 199)
    )
    want = read_table_where(spark, root, {"k": (100, 199)}, version=2)
    assert _rows(got) == _rows(want)


def test_sql_using_view_worker_side_schema(spark, table):
    root, _log = table
    register(spark)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW snap_t "
        f"USING snapshot_table OPTIONS (path '{root}')"
    )
    got = spark.sql("SELECT k, v FROM snap_t WHERE k BETWEEN 100 AND 109")
    want = (
        read_table_at(spark, root)
        .filter("k BETWEEN 100 AND 109")
        .select("k", "v")
    )
    assert _rows(got) == _rows(want)
    with pytest.raises(Exception, match="not both"):
        spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW snap_bad USING snapshot_table "
            f"OPTIONS (path '{root}', version '1', ref 'pre')"
        ).collect()


def test_pure_scan_plan_parity(spark, table):
    root, log = table
    for preds in ({"k": (100, 450)}, {"k": 137}, {"g": (8, 9)}):
        assert scan_plan(None, root, preds) == scan_plan(spark, root, preds)
    # PureSnapshotLog mirrors SnapshotLog's read accessors
    pure = PureSnapshotLog(root)
    assert pure.versions() == log.versions()
    assert pure.files() == log.files()
    assert pure.delete_files() == log.delete_files()
    assert pure.resolve_ref("pre") == log.resolve_ref("pre")
    assert pure.stats(2).keys() == log.stats(2).keys()


def test_sharded_planning_opens_only_surviving_parts(
    spark, tmp_path, monkeypatch
):
    """The format's planner inherits the two-level metadata
    discipline: a narrow probe over a sharded manifest opens exactly
    the surviving shard part files (intercepted reads)."""
    from hbase_compact_spark.compaction.snapshots import shard_manifest

    root = str(tmp_path / "sharded")
    os.makedirs(root)
    log = SnapshotLog(spark, root)
    files = [(f"part-{i:05d}.parquet", 1024) for i in range(1000)]
    stats = {
        rel: {"rows": 100, "cols": {"k": [i * 100, (i + 1) * 100 - 1]}}
        for i, (rel, _) in enumerate(files)
    }
    log.commit(files, op="synthetic", stats=stats)
    v2 = shard_manifest(spark, root, "k", shards=10)

    reader = SnapshotTableReader(
        "k long", {"path": root, "version": str(v2)}
    )
    reader._preds = {"k": (12_345, 12_400)}
    opened: list[str] = []
    orig = snap_mod._read_manifest_table

    def counting(path, columns=None):
        opened.append(posixpath.basename(path))
        return orig(path, columns)

    monkeypatch.setattr(snap_mod, "_read_manifest_table", counting)
    plan, parts = reader.plan()
    assert plan["shards_total"] == 10 and plan["shards_opened"] == 1
    assert len(opened) == 1
    assert plan["paths"] == ["part-00123.parquet", "part-00124.parquet"]
    assert [p.relpath for p in parts] == plan["paths"]


def test_schema_evolution_projects_null(spark, tmp_path):
    from hbase_compact_spark.compaction.snapshots import evolve_schema

    root = str(tmp_path / "evo")
    spark.range(50).select(F.col("id").alias("k")).write.parquet(root)
    log = SnapshotLog(spark, root)
    log.bootstrap()
    evolve_schema(spark, root, add_columns={"note": "string"})
    df = read_table(spark, root)
    assert df.columns == ["k", "note"]
    assert df.filter(F.col("note").isNull()).count() == 50


def test_timestamp_as_of(spark, table, tmp_path):
    """TIMESTAMP AS OF: the format (and read_table_at) resolve an
    instant to the latest snapshot committed at or before it —
    boundary-exact, ISO-string and epoch forms, pre-history refusal.
    The fixture's committed_at stamps are respaced on disk so the
    versions are seconds apart (commits in tests land in one
    second)."""
    import json

    from hbase_compact_spark.compaction.snapshots import version_as_of

    root, log = table
    for i, v in enumerate(log.versions()):
        p = f"{root}/_snapshots/v{v:012d}.json"
        with open(p) as f:
            snap = json.load(f)
        snap["committed_at"] = 1_000_000 + i * 100
        with open(p, "w") as f:
            json.dump(snap, f)
        # the JVM side reads through Hadoop's checksummed local FS —
        # drop the stale .crc sidecar of the rewritten JSON
        crc = f"{root}/_snapshots/.v{v:012d}.json.crc"
        if os.path.exists(crc):
            os.remove(crc)
    vs = log.versions()
    assert version_as_of(log, 1_000_000) == vs[0]      # exact boundary
    assert version_as_of(log, 1_000_199) == vs[1]      # between commits
    assert version_as_of(log, 2_000_000) == vs[-1]     # future = latest
    with pytest.raises(ValueError, match="at or before"):
        version_as_of(log, 999_999)                    # pre-history
    # the format reads the as-of state (epoch form), equal to the
    # explicit-version read; v2 here = the stats annotation commit
    got = read_table(spark, root, timestamp_as_of=1_000_100)
    want = read_table_at(spark, root, version=vs[1])
    assert _rows(got) == _rows(want)
    # read_table_at's own kwarg + the ISO-string form agree
    assert _rows(
        read_table_at(spark, root, as_of_ts="1970-01-12T13:46:40+00:00")
    ) == _rows(read_table_at(spark, root, version=vs[0]))
    with pytest.raises(Exception, match="only one|not both"):
        read_table(spark, root, version=2, timestamp_as_of=1_000_100)


def test_in_list_pushdown_prunes(spark, table):
    """IN-list pushdown: the planner keeps only files that may hold
    AT LEAST ONE listed value (per-value union over the cached
    manifest), and the SQL result equals the unpruned filter."""
    root, _log = table
    reader = SnapshotTableReader(
        table_schema(root), {"path": root, "version": "2"}
    )
    reader._in_preds = {"k": (10, 650)}
    plan, parts = reader.plan()
    # values 10 and 650 live in two different range files of eight
    assert plan["kept_files"] == 2 and plan["pruned_files"] == 6
    register(spark)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW snap_in "
        f"USING snapshot_table OPTIONS (path '{root}', version '2')"
    )
    got = spark.sql("SELECT k, v FROM snap_in WHERE k IN (10, 650, 5000)")
    want = (
        read_table_at(spark, root, version=2)
        .filter(F.col("k").isin(10, 650, 5000))
        .select("k", "v")
    )
    assert _rows(got) == _rows(want)


def test_hive_layout_path_values(spark, tmp_path):
    root = str(tmp_path / "hive")
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("string").alias("region")
    ).write.partitionBy("region").parquet(root)
    SnapshotLog(spark, root).bootstrap()
    df = read_table(spark, root)
    assert set(df.columns) == {"k", "region"}
    got = _rows(df.groupBy("region").count().orderBy("region"))
    assert got == [("0", 25), ("1", 25), ("2", 25), ("3", 25)]
