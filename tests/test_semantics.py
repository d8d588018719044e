"""Semantic-fidelity unit tests for the traps called out in SURVEY §7:
arg-max tie determinism, the >1-file HAVING boundary, and inventory
uniqueness."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_compact_spark.operators.relational import argmax_by, having
from hbase_compact_spark.sources.inventory import derived_inventory


def test_argmax_tie_breaks_to_largest_name(spark):
    """The reference keeps the FIRST max encountered in listing order
    (QHBaseCompact.java:157-160) — not a stable contract. Ours breaks
    ties to the LARGEST arg value, deterministically."""
    df = spark.createDataFrame(
        [("g", "a_file", 100), ("g", "z_file", 100), ("g", "m_file", 50)],
        "grp string, file string, size long",
    )
    out = argmax_by(df, ["grp"], "size", "file", alias="winner").collect()
    assert out[0]["winner"] == "z_file"
    assert out[0]["max_size"] == 100


def test_having_boundary_exactly_one_file(spark):
    """filenum == 1 must NOT pass the compactability gate; == 2 must
    (QHBaseCompact.java:151 strict `> 1`)."""
    df = spark.createDataFrame(
        [("solo", "f1", 10), ("pair", "f1", 10), ("pair", "f2", 20)],
        "grp string, file string, size long",
    )
    grouped = df.groupBy("grp").agg(F.count("*").alias("filenum"))
    out = {r["grp"] for r in having(grouped, F.col("filenum") > 1).collect()}
    assert out == {"pair"}


def test_inventory_file_names_unique_per_group(spark):
    inv = derived_inventory(spark, "/root/testdata/sf0.001")
    n = inv.count()
    assert (
        inv.select("table_name", "region", "family", "file").distinct().count() == n
    )
