"""Config source (A1/A2 parity) and file-inventory source tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hbase_compact_spark.sources.config import (
    CompactionConfig,
    load_config,
    parse_properties,
    store_config,
)
from hbase_compact_spark.sources.inventory import file_inventory
from hbase_compact_spark.tables import load_table

# the reference's shipped config, verbatim (conf/config.properties)
REFERENCE_PROPS = """\
#Fri Jan 09 15:04:32 CST 2015
regionindex=100
tablename=qmq_backup
starttime=08\\:30\\:00
endtime=12\\:30\\:00
marjorfilesize=530000000000
directcompactsize=100000000000
"""


def test_parse_reference_shipped_config(tmp_path):
    p = tmp_path / "config.properties"
    p.write_text(REFERENCE_PROPS)
    cfg = load_config(str(p))
    assert cfg.regionindex == 100
    assert cfg.tablename == "qmq_backup"
    assert cfg.starttime == "08:30:00"
    assert cfg.endtime == "12:30:00"
    assert cfg.marjorfilesize == 530_000_000_000
    assert cfg.directcompactsize == 100_000_000_000


def test_config_round_trip(tmp_path):
    p = tmp_path / "cfg.properties"
    cfg = CompactionConfig(
        starttime="01:02:03",
        endtime="04:05:06",
        tablename="t1",
        regionindex=7,
    )
    store_config(str(p), cfg)
    assert load_config(str(p)) == cfg
    # escaped colons survive for java Properties compatibility
    assert "01\\:02\\:03" in p.read_text()


def test_malformed_config_raises(tmp_path):
    p = tmp_path / "bad.properties"
    p.write_text("regionindex=not_a_number\n")
    with pytest.raises(ValueError):
        load_config(str(p))


def test_comments_and_blanks_ignored():
    props = parse_properties("# c\n! also\n\nk=v\nnoequals\n")
    assert props == {"k": "v"}


def test_file_inventory_source(spark, tmp_path):
    """file_inventory lists a region/family tree with correct layout
    columns, sizes and no content read."""
    root = str(tmp_path / "store")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for region in ["r0", "r1"]:
        for family in ["cf1", "cf2"]:
            (
                docs.limit(50)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{root}/{region}/{family}")
            )
    inv = file_inventory(spark, root).filter(F.col("file").endswith(".parquet"))
    rows = inv.collect()
    assert {(r["region"], r["family"]) for r in rows} == {
        ("r0", "cf1"),
        ("r0", "cf2"),
        ("r1", "cf1"),
        ("r1", "cf2"),
    }
    assert all(r["size_bytes"] > 0 for r in rows)
    on_disk = {
        f: os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    }
    assert {r["file"]: r["size_bytes"] for r in rows} == on_disk


def test_file_inventory_handles_regex_metachars_in_root(spark, tmp_path):
    """Roots containing regex metacharacters must strip cleanly —
    prefix removal is exact string arithmetic, not a regex."""
    import pyspark.sql.functions as F

    root = tmp_path / "run+1 (x)" / "table"
    for region, family in [("r0", "cf1"), ("r1", "cf2")]:
        d = root / region / family
        d.mkdir(parents=True)
        spark.range(3).write.mode("overwrite").parquet(str(d / "f.parquet"))
    from hbase_compact_spark.sources.inventory import file_inventory

    inv = file_inventory(spark, str(root))
    got = {
        (r["region"], r["family"])
        for r in inv.select("region", "family").distinct().collect()
    }
    assert got == {("r0", "cf1"), ("r1", "cf2")}
    assert inv.filter(F.col("size_bytes") <= 0).count() == 0


def test_format_roundtrip_preserves_values_and_nulls(spark, tmp_path):
    """Every supported format must round-trip typed values EXACTLY
    under the schema-applied read — including NULLs in numeric and
    timestamp columns. (Known text-format caveat, asserted here so it
    stays documented behavior: CSV cannot distinguish NULL from empty
    STRING — both land as NULL — while JSON/ORC/parquet keep them
    distinct.)"""
    from pyspark.sql import functions as F

    from hbase_compact_spark.sources.formats import (
        FORMATS,
        read_table,
        write_table,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 3.25, "2026-01-02 03:04:05.123456"),
            (2, "", None, None),
            (3, None, -0.1, "1999-12-31 23:59:59.000001"),
        ],
        "id long, s string, v double, ts_s string",
    ).select("id", "s", "v", F.col("ts_s").cast("timestamp").alias("ts"))
    rows = {r["id"]: r for r in df.collect()}
    for fmt in FORMATS:
        path = str(tmp_path / fmt)
        write_table(df, path, fmt)
        back = {
            r["id"]: r
            for r in read_table(spark, path, fmt, df.schema).collect()
        }
        assert set(back) == {1, 2, 3}
        for i in (1, 2, 3):
            exp = rows[i]
            got = back[i]
            assert got["v"] == exp["v"], (fmt, i)
            assert got["ts"] == exp["ts"], (fmt, i)
            if fmt == "csv" and exp["s"] == "":
                assert got["s"] in ("", None)  # the documented caveat
            else:
                assert got["s"] == exp["s"], (fmt, i)
