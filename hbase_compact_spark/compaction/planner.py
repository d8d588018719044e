"""Bin-packing compaction planner.

The reference compacts ONE (region, family) store at a time and lets
the region server decide output shape (QHBaseCompact.java:167 —
`majorCompact` RPC; selection gate `:151` filenum > 1). Our engine
plans explicitly: greedy first-fit-decreasing assignment of small
files into target-size output bins, one plan row per input file.

Procedural per-group logic ⇒ `applyInPandas` over the group key (the
one place pure DataFrame ops can't express the semantics). The
inventory is metadata (one row per FILE, not per data row), so even a
100 TB / ~800k-file table is a few MB per group — the shuffle moves
almost nothing and each group's pack runs in microseconds.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

PLAN_SCHEMA = (
    "table_name string, region string, family string, file string, "
    "size_bytes long, bin_id int, bin_files int, bin_bytes long"
)

GROUP_KEYS = ["table_name", "region", "family"]


def _pack_group(pdf: pd.DataFrame, target_bytes: int) -> pd.DataFrame:
    """First-fit-decreasing within one (table, region, family) group.

    Deterministic: files sorted by (size desc, name asc); a file
    larger than `target_bytes` gets a bin of its own (mirrors the
    documented-but-dead `marjorfilesize` intent — oversized inputs
    are not merged further, README.md:23).
    """
    import numpy as np

    pdf = pdf.sort_values(
        ["size_bytes", "file"], ascending=[False, True], kind="mergesort"
    )
    # remaining capacity per bin, vectorized first-fit probe (argmax of
    # a boolean mask runs in C; the python loop is per FILE only)
    remaining = np.empty(len(pdf), dtype="int64")
    n_bins = 0
    assignment = np.empty(len(pdf), dtype="int32")
    for row, size in enumerate(pdf["size_bytes"].to_numpy()):
        fits = remaining[:n_bins] >= size
        if fits.any():
            b = int(np.argmax(fits))
            remaining[b] -= size
        else:
            b = n_bins
            # may go negative for oversized files: closes the bin to
            # everything, including zero-byte files (hypothesis-found
            # edge: clamping to 0 let size-0 files join oversized bins)
            remaining[b] = target_bytes - size
            n_bins += 1
        assignment[row] = b
    out = pdf.copy()
    out["bin_id"] = pd.array(assignment, dtype="int32")
    stats = out.groupby("bin_id")["size_bytes"].agg(["count", "sum"])
    out["bin_files"] = out["bin_id"].map(stats["count"]).astype("int32")
    out["bin_bytes"] = out["bin_id"].map(stats["sum"]).astype("int64")
    return out[
        [
            "table_name",
            "region",
            "family",
            "file",
            "size_bytes",
            "bin_id",
            "bin_files",
            "bin_bytes",
        ]
    ]


def plan_bins(inventory: DataFrame, target_bytes: int) -> DataFrame:
    """Build the compaction plan for every group with >1 file
    (the compactability gate, QHBaseCompact.java:151).

    Input: inventory with at least GROUP_KEYS + (file, size_bytes).
    Output: one row per file with its assigned output bin.
    """
    from hbase_compact_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(inventory.sparkSession)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) <= 1:  # the >1-file gate, enforced in-group so the
            # plan needs ONE shuffle (a pre-filter window would add one)
            return pdf.iloc[0:0].assign(
                bin_id=pd.array([], dtype="int32"),
                bin_files=pd.array([], dtype="int32"),
                bin_bytes=pd.array([], dtype="int64"),
            )
        return _pack_group(pdf, target_bytes)

    return (
        inventory.select(*GROUP_KEYS, "file", "size_bytes")
        .groupBy(*GROUP_KEYS)
        .applyInPandas(pack, schema=PLAN_SCHEMA)
    )
