"""Extended-OLAP behavior checks that the oracle can't express:
sketch accuracy bounds for the approximate aggregates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import hbase_compact_spark.workload_olap as olap
from hbase_compact_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_stats_within_tolerance(spark):
    approx = {r["l_returnflag"]: r for r in olap.approx_stats(spark, SF_DIR).collect()}
    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_orders"] - e["orders"]) / e["orders"] < 0.05
        assert abs(a["approx_median_price"] - e["median"]) / e["median"] < 0.05


def test_cube_lattice_consistency(spark):
    """CUBE totals must be internally consistent: the ALL/ALL cell
    equals the sum of the finest-grain cells."""
    out = olap.cube_stats(spark, SF_DIR).collect()
    fine = [r for r in out if r["region"] != "ALL" and r["family"] != "ALL"]
    total = [r for r in out if r["region"] == "ALL" and r["family"] == "ALL"]
    assert len(total) == 1
    assert total[0]["filenum"] == sum(r["filenum"] for r in fine)
    assert total[0]["total_bytes"] == sum(r["total_bytes"] for r in fine)


def test_exact_group_percentiles_bitmatch_builtin(spark):
    """The distributed count+window percentile must be BIT-IDENTICAL
    to Spark's builtin percentile() (same type-7 interpolation)."""
    from hbase_compact_spark.operators.percentiles import exact_group_percentiles

    li = load_table(spark, SF_DIR, "lineitem")
    mine = {
        r["l_returnflag"]: r
        for r in exact_group_percentiles(
            li,
            "l_returnflag",
            "l_extendedprice",
            [("p05", 0.05), ("p50", 0.5), ("p95", 0.95), ("p0", 0.0), ("p1", 1.0)],
        ).collect()
    }
    builtin = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"percentile(l_extendedprice, {p})").alias(a)
                for a, p in [
                    ("p05", 0.05),
                    ("p50", 0.5),
                    ("p95", 0.95),
                    ("p0", 0.0),
                    ("p1", 1.0),
                ]
            ]
        )
        .collect()
    }
    assert set(mine) == set(builtin)
    for flag, m in mine.items():
        for a in ("p05", "p50", "p95", "p0", "p1"):
            assert m[a] == builtin[flag][a], (flag, a)


def test_exact_group_percentiles_edges(spark):
    """Singleton groups, duplicate-heavy groups, and NULLs."""
    from hbase_compact_spark.operators.percentiles import exact_group_percentiles

    df = spark.createDataFrame(
        [("a", 7.0), ("b", 1.0), ("b", 1.0), ("b", 1.0), ("b", 3.0), ("b", None)],
        "g string, v double",
    )
    out = {
        r["g"]: r
        for r in exact_group_percentiles(
            df, "g", "v", [("p50", 0.5), ("p75", 0.75)]
        ).collect()
    }
    assert out["a"]["p50"] == 7.0 and out["a"]["p75"] == 7.0
    # b: values 1,1,1,3 (NULL ignored) -> p50 = 1.0, p75 = 1 + 0.25*(3-1) = 1.5
    assert out["b"]["p50"] == 1.0
    assert out["b"]["p75"] == 1.5


def test_gapfill_grid_dense_and_locf(spark):
    """Gap-fill invariants: per type the hour grid is DENSE over
    [min, max] (span = rows, no holes), gap rows carry n_events=0 /
    sum_value=0, observed rows carry their own sum, and locf_value
    equals the most recent observed (non-gap) sum at or before the
    row."""
    out = olap.gapfill_resample(spark, SF_DIR).toPandas()
    assert out.gap_filled.any(), "fixture must exercise the fill path"
    for etype, g in out.groupby("event_type"):
        g = g.sort_values("hour_start").reset_index(drop=True)
        import pandas as pd

        hours = pd.to_datetime(g.hour_start)
        span = int((hours.max() - hours.min()).total_seconds() // 3600) + 1
        assert span == len(g), f"{etype}: grid has holes"
        assert (hours.diff().dropna().dt.total_seconds() == 3600).all()
        # first grid row is an observed hour by construction (min(h))
        assert not g.gap_filled.iloc[0]
        last = None
        for _, r in g.iterrows():
            if r.gap_filled:
                assert r.n_events == 0 and r.sum_value == 0.0
                assert r.locf_value == last
            else:
                assert r.n_events > 0
                last = r.sum_value
                assert r.locf_value == r.sum_value


def test_decay_hotness_matches_independent_recompute(spark, sf_dir):
    """Recompute the decayed sum independently in pandas (numpy exp,
    python Decimal quantization) and require exact agreement with the
    engine's per-term-rounded DECIMAL sum."""
    from decimal import Decimal

    import numpy as np

    from hbase_compact_spark.tables import load_table
    from hbase_compact_spark.workload_olap import _DECAY_LAMBDA, decay_hotness

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    ).toPandas()
    lam = float(_DECAY_LAMBDA)
    tmax = ev["ts"].max()
    age_days = (
        (tmax - ev["ts"]).dt.total_seconds() * 1e6
    ).round() / 86400e6
    term = ev["value"].to_numpy() * np.exp(-lam * age_days.to_numpy())
    ev["term"] = [
        Decimal(repr(round(t, 6))).quantize(Decimal("0.000001"))
        for t in term
    ]
    want = {
        k: (len(g), float(sum(g["term"])))
        for k, g in ev.groupby("event_type")
    }
    got = {
        r["event_type"]: (r["n_events"], r["hotness"])
        for r in decay_hotness(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6), k


def test_star_join_invariants(spark, sf_dir):
    """Region scoping + arithmetic invariants: only ASIA nations
    appear, every group is non-empty, and revenue equals the
    independently-folded decimal sum for one spot-checked nation."""
    import duckdb

    from hbase_compact_spark.workload_olap import star_join

    rows = star_join(spark, sf_dir).collect()
    assert rows, "ASIA intra-nation trade must be non-empty"
    asia = {
        r[0]
        for r in duckdb.sql(
            f"""SELECT n_name FROM '{sf_dir}/nation.parquet' n
                JOIN '{sf_dir}/region.parquet' r
                  ON n_regionkey = r_regionkey
                WHERE r_name = 'ASIA'"""
        ).fetchall()
    }
    for r in rows:
        assert r["n_name"] in asia
        assert r["n_lineitems"] > 0
        assert r["revenue"] > 0.0


def test_star_join_source_has_no_forced_broadcast():
    """The dimension joins must stay unhinted (AQE decides) — the
    r7/r8 no-forced-broadcast-on-growing-frames discipline."""
    import inspect

    from hbase_compact_spark.workload_olap import star_join

    assert "F.broadcast(" not in inspect.getsource(star_join)


def test_scd2_intervals_chain_and_close(spark, sf_dir):
    """SCD2 structural contract: per user, intervals chain exactly
    (valid_to == next valid_from), exactly ONE open current row,
    consecutive states actually differ, and the first interval
    starts at the user's first event."""
    from collections import defaultdict

    from hbase_compact_spark.tables import load_table
    from hbase_compact_spark.workload_olap import scd2_dimension

    rows = scd2_dimension(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    first_ts = {
        r["user_id"]: r["first_ts"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"))
        .collect()
    }
    assert set(by_user) == set(first_ts)
    for uid, ivs in by_user.items():
        # second-truncated valid_from can tie across adjacent
        # intervals; valid_to (None = open = last) breaks the tie
        ivs.sort(
            key=lambda r: (
                r["valid_from"],
                r["valid_to"] is None,
                r["valid_to"] or "",
            )
        )
        assert sum(r["is_current"] for r in ivs) == 1
        assert ivs[-1]["is_current"] == 1 and ivs[-1]["valid_to"] is None
        assert ivs[0]["valid_from"] == first_ts[uid]
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["event_type"] != b["event_type"]
