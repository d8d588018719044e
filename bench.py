#!/usr/bin/env python
"""Benchmark harness — runs every registered query end-to-end at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Execution is a `noop`-format write: the full physical plan runs
distributed (scan -> shuffle -> agg) with nothing collected to the
driver, so timings measure the engine, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from hbase_compact_spark import registry  # noqa: E402
from hbase_compact_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    name = os.path.basename(d.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark("hbase_compact_spark_bench")
    queries = entrymod.queries()

    # warm the JVM/session, the Python worker pool, and the page cache
    # (pre-touch every fixture file) so the first queries measure the
    # engine rather than one-time startup / cold IO
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1_000).toDF("id").mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    for dirpath, _dirs, files in os.walk(SF_DIR):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            try:  # tables may be files OR directories of part files
                with open(os.path.join(dirpath, name), "rb") as f:
                    while f.read(1 << 22):
                        pass
            except OSError:
                pass  # cache warming is best-effort

    RUNS = 3  # median-of-3: the first execution of a query pays
    # one-time codegen compilation of its expression trees (measured
    # 2-3x on the sketch-heavy queries) and sub-second magnitudes are
    # noisy; the median is robust to both the warmup outlier and a
    # lucky fastest run, so round-over-round deltas are signal
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in sorted(queries):
        runs: list[float] = []
        try:
            for _ in range(RUNS):
                # drop session-scoped shared-intermediate memos so every
                # run pays the query's full cost — medians must measure
                # the engine, not a result cache
                registry.clear_session_caches()
                t0 = time.perf_counter()
                df = queries[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(sorted(runs)[len(runs) // 2], 3)
        except Exception as exc:  # one broken query must not zero the round
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]

    total = round(sum(timings.values()), 3)

    # noise band (VERDICT r12 task 6): re-time a fixed probe set a
    # second time at the END of the suite — identical code, same
    # session, minutes apart — and record the second/first-median
    # ratio distribution. This is the SAME-TREE noise floor measured
    # inside the artifact itself, so a round-over-round comparison
    # can tell code regressions from box drift (r12's closing-vs-
    # control delta was indistinguishable from variance measured on
    # identical code). Probes span the engine's families (scan, agg,
    # join, window, text, similarity) and are cheap (<0.5 s each).
    probe_names = [
        n
        for n in (
            "scan_project", "groupby_stats", "join_equi",
            "window_running", "topk_order_limit", "token_count",
            "quality_score", "similarity_topk", "rollup_total",
            "anomaly_zscore",
        )
        if n in timings
    ]
    ratios: list[float] = []
    for name in probe_names:
        runs2: list[float] = []
        try:
            for _ in range(RUNS):
                registry.clear_session_caches()
                t0 = time.perf_counter()
                queries[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs2.append(time.perf_counter() - t0)
        except Exception:
            continue  # the probe is telemetry; never fail the bench
        second = sorted(runs2)[len(runs2) // 2]
        if timings[name] > 0:
            ratios.append(round(second / timings[name], 3))
    noise_band = None
    if ratios:
        rs = sorted(ratios)
        noise_band = {
            "probe_queries": len(rs),
            "ratio_min": rs[0],
            "ratio_median": rs[len(rs) // 2],
            "ratio_max": rs[-1],
            "note": "2nd-pass/1st-pass median ratio per probe query, "
            "identical code + session — the same-tree noise floor; "
            "cross-round per-query deltas inside [min, max] are box "
            "drift, not code",
        }

    # key order matters: the round harness records only the TAIL of
    # this line, so the headline aggregates (value, failures) go LAST
    # — the per-query dict is what gets truncated, not the totals
    out = {
        "metric": "total_runtime_all_queries",
        "queries": timings,
        "runs_per_query": RUNS,
        "aggregation": "median",
        "sf": _sf_from_dir(SF_DIR),
        "n_queries_timed": len(timings),
        "n_failures": len(failures),
    }
    if noise_band:
        out["noise_band"] = noise_band
    if failures:
        # full 200-char messages stay in the line (triage needs the
        # exception text more than it needs per-query timings); the
        # UNtruncated messages also go to a side file in case the
        # recorded tail still clips the line
        out["failures"] = dict(failures)
        try:
            with open("/tmp/bench_failures.json", "w") as f:
                json.dump(failures, f, indent=1)
        except OSError:
            pass
    out["unit"] = "sec"
    out["value"] = total
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
