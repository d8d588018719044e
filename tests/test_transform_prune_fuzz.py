"""Property-based fuzzing of the transform-prune layer (VERDICT r12
task 8): for every partition-transform family, `read_table_where`
(stats/path pruning + exact filter) must equal full-scan + the same
filter for ARBITRARY typed probe values — ints, bools, floats
(integral and not), Decimals at every scale, naive/aware datetimes,
dates, canonical and non-canonical ISO strings, garbage strings.

This is exactly the silent-wrong-prune class the r12 ADVICE items
(bucket rendering of float probes, 'T'-separated hours() bounds) sat
in: a derived `_hp_` bound that renders differently from Spark's own
path value silently drops in-range files. The property needs no
oracle knowledge — pruning is allowed to keep too much, never too
little, so the two read paths must agree row-for-row on every draw.
"""

from __future__ import annotations

import datetime as dt
import decimal
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hbase_compact_spark.compaction.snapshots import (
    SnapshotLog,
    append_partitioned,
    evolve_partitioning,
    read_table_at,
    read_table_where,
)

_UTC = dt.timezone.utc
_IST = dt.timezone(dt.timedelta(hours=5, minutes=30))
_NEG = dt.timezone(dt.timedelta(hours=-7))


def _build(spark, base: str, name: str, spec: str, df) -> str:
    """Seed row plain -> bootstrap -> evolve to `spec` -> append the
    full frame under `_hp_` dirs: (almost) every row prunes from the
    path value alone, which is the layer under test."""
    root = f"{base}/{name}"
    df.limit(1).coalesce(1).write.parquet(root)
    SnapshotLog(spark, root).bootstrap()
    evolve_partitioning(spark, root, [spec])
    append_partitioned(spark, root, df)
    return root


@pytest.fixture(scope="module")
def transform_tables(spark):
    base = tempfile.mkdtemp(prefix="hcs_tpfuzz_")
    t0 = dt.datetime(2024, 2, 27, 0, 0, 0)
    ts_rows = spark.createDataFrame(
        [
            (i, t0 + dt.timedelta(hours=7 * i + (i % 3)))
            for i in range(40)
        ]
        + [  # exact boundary instants
            (100, dt.datetime(2024, 3, 1, 0, 0, 0)),
            (101, dt.datetime(2024, 2, 29, 23, 59, 59)),
            (102, dt.datetime(2024, 3, 2, 0, 0, 1)),
        ],
        "id long, ts timestamp",
    )
    int_rows = spark.createDataFrame(
        [(i, k) for i, k in enumerate(range(-250, 251, 17))]
        + [(900, 0), (901, -1), (902, 99), (903, -100), (904, 251)],
        "id long, k long",
    )
    str_rows = spark.createDataFrame(
        [
            (i, s)
            for i, s in enumerate(
                ["", "a", "ab", "abc", "abcd", "abcde", "abzz",
                 "Straße", "zzz", "ZZ9", "0", "00", "-1", "251",
                 "mango", "manGO", "μήλο"]
            )
        ],
        "id long, s string",
    )
    dec_rows = spark.createDataFrame(
        [(i, decimal.Decimal(v) / 100) for i, v in enumerate(range(-500, 501, 37))],
        "id long, d decimal(9,2)",
    )
    tables = {
        "days": _build(spark, base, "days", "days(ts)", ts_rows),
        "hours": _build(spark, base, "hours", "hours(ts)", ts_rows),
        "months": _build(spark, base, "months", "months(ts)", ts_rows),
        "bucket_int": _build(spark, base, "bi", "bucket(8, k)", int_rows),
        "bucket_str": _build(spark, base, "bs", "bucket(8, s)", str_rows),
        "trunc_int": _build(spark, base, "ti", "truncate(100, k)", int_rows),
        "trunc_str": _build(spark, base, "ts_", "truncate(4, s)", str_rows),
        "trunc_dec": _build(spark, base, "td", "truncate(50, d)", dec_rows),
    }
    yield tables
    shutil.rmtree(base, ignore_errors=True)


def _assert_prune_exact(spark, root, preds) -> None:
    got = sorted(map(tuple, read_table_where(spark, root, preds).collect()))
    full = read_table_at(spark, root)
    for col, pred in preds.items():
        if not isinstance(pred, tuple):
            full = full.filter(F.col(col) == F.lit(pred))
            continue
        lo, hi = pred
        if lo is not None:
            full = full.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            full = full.filter(F.col(col) <= F.lit(hi))
    want = sorted(map(tuple, full.collect()))
    assert got == want, f"prune diverged for {preds!r}"


# --- typed probe pools -------------------------------------------------
ts_probe = st.one_of(
    st.datetimes(
        min_value=dt.datetime(2024, 2, 26),
        max_value=dt.datetime(2024, 3, 12),
    ),
    st.datetimes(
        min_value=dt.datetime(2024, 2, 26),
        max_value=dt.datetime(2024, 3, 12),
    ).map(lambda d: d.replace(tzinfo=_IST)),
    st.datetimes(
        min_value=dt.datetime(2024, 2, 26),
        max_value=dt.datetime(2024, 3, 12),
    ).map(lambda d: d.replace(tzinfo=_NEG)),
    st.dates(
        min_value=dt.date(2024, 2, 26), max_value=dt.date(2024, 3, 12)
    ),
    st.sampled_from(
        [
            "2024-02-29 23:59:59",
            "2024-03-01",
            "2024-03-01T05",
            "2024-3-1",          # non-canonical: must stay conservative
            "2024-03-02 00:00:01+05:30",
            "2024-02-29T18:30:00-07:00",
        ]
    ),
)

int_probe = st.one_of(
    st.integers(min_value=-300, max_value=300),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.sampled_from([-100.0, 0.0, 99.0, 251.0]),      # integral floats
    st.floats(min_value=-300, max_value=300).filter(
        lambda x: not float(x).is_integer()
    ),
    st.decimals(min_value=-300, max_value=300, places=2),
)

str_probe = st.one_of(
    st.text(
        alphabet="abzZ09μß-", min_size=0, max_size=6
    ),
    st.sampled_from(["abc", "abcd", "abcde", "mang", "Stra", "251", ""]),
)

dec_probe = st.one_of(
    *[
        st.decimals(min_value=-6, max_value=6, places=p)
        for p in (0, 1, 2, 3, 4)
    ],
    st.integers(min_value=-6, max_value=6),
    st.floats(min_value=-6, max_value=6, allow_nan=False),
)


# lo > hi is a legal (empty) query and must stay exact; one side may
# be unbounded — so ranges draw unordered with optional None sides.
_COMMON = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.mark.parametrize("family", ["days", "hours", "months"])
@settings(**_COMMON)
@given(lo=st.one_of(st.none(), ts_probe), hi=st.one_of(st.none(), ts_probe))
def test_fuzz_time_transform_prune(spark, transform_tables, family, lo, hi):
    _assert_prune_exact(spark, transform_tables[family], {"ts": (lo, hi)})


@settings(**_COMMON)
@given(v=int_probe)
def test_fuzz_bucket_int_prune(spark, transform_tables, v):
    _assert_prune_exact(spark, transform_tables["bucket_int"], {"k": v})


@settings(**_COMMON)
@given(v=str_probe)
def test_fuzz_bucket_str_prune(spark, transform_tables, v):
    _assert_prune_exact(spark, transform_tables["bucket_str"], {"s": v})


@settings(**_COMMON)
@given(lo=st.one_of(st.none(), int_probe), hi=st.one_of(st.none(), int_probe))
def test_fuzz_trunc_int_prune(spark, transform_tables, lo, hi):
    _assert_prune_exact(spark, transform_tables["trunc_int"], {"k": (lo, hi)})


@settings(**_COMMON)
@given(lo=st.one_of(st.none(), str_probe), hi=st.one_of(st.none(), str_probe))
def test_fuzz_trunc_str_prune(spark, transform_tables, lo, hi):
    _assert_prune_exact(spark, transform_tables["trunc_str"], {"s": (lo, hi)})


@settings(**_COMMON)
@given(lo=st.one_of(st.none(), dec_probe), hi=st.one_of(st.none(), dec_probe))
def test_fuzz_trunc_dec_prune(spark, transform_tables, lo, hi):
    _assert_prune_exact(spark, transform_tables["trunc_dec"], {"d": (lo, hi)})


def test_bucket_cross_domain_probe_stays_conservative(spark, tmp_path):
    """Deterministic pin for the bucket cross-domain gate: an INT
    probe against a STRING bucket column must not derive — Spark's
    equality coerces the string side ('0251' = 251 matches), but
    crc32('0251') lives in a different bucket than crc32('251'), so
    a derived prune would silently drop the matching row. Same gate,
    other direction: a string probe on the INT bucket table derives
    nothing and stays exact."""
    root = str(tmp_path / "bx")
    df = spark.createDataFrame(
        [(1, "0251"), (2, "251"), (3, "999")], "id long, s string"
    )
    df.limit(1).coalesce(1).write.parquet(root)
    SnapshotLog(spark, root).bootstrap()
    evolve_partitioning(spark, root, ["bucket(8, s)"])
    append_partitioned(spark, root, df)
    got = sorted(
        r["id"]
        for r in read_table_where(spark, root, {"s": 251}).collect()
    )
    want = sorted(
        r["id"]
        for r in read_table_at(spark, root)
        .filter(F.col("s") == F.lit(251))
        .collect()
    )
    assert got == want and 1 in got  # '0251' row survives the prune
