#!/usr/bin/env python
"""Full-surface oracle sweep — the committed, machine-readable twin of
the driver's 50-slot CORRECTNESS window.

The driver's per-round harness records at most ~50 queries; the other
~60 were previously verified only in STATE.md prose. This tool runs
EVERY registered query against its DuckDB oracle (driver-identical
compare: row count + schema + order-insensitive value hash) and writes
`ORACLE_FULL_r{N}.json` with one row per query:

    {"rows_match": bool, "schema_match": bool, "hash_match": bool,
     "spark_rows": int, "oracle_rows": int, "err": str|null,
     "seconds": float}

rows-only queries (no oracle by design) get err="no_oracle" with their
row count, same convention as the driver. Run from anywhere:

    python tools_oracle_full.py [--sf-dir /root/testdata/sf0.01]
                                [--round N] [--out FILE]

The sweep intentionally uses a DEFAULT SparkSession (like the driver),
not the tuned factory, so config assumptions surface here first.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)

# fixture-memo tags the forced-branch run wipes before import (so the
# capped builders rebuild under the forced branch); the recorded
# _meta["memos_wiped"] derives from this SAME tuple — the provenance
# metadata can never understate what was rebuilt (ADVICE r10)
_FORCED_WIPE_TAGS = (
    "clusterlabels",
    "merge_scan",
    "merge_full",
    "mor_delete_scan",
    "eqdelete_scan",
    "mor_upsert_scan",
)
sys.path.insert(0, _REPO)


def _default_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def _hash_pdf(pdf) -> tuple[str, int, list[str]]:
    cols = sorted(pdf.columns)
    vals = sorted(
        tuple(repr(v) for v in r)
        for r in pdf[cols].itertuples(index=False, name=None)
    )
    digest = hashlib.md5(str(vals).encode()).hexdigest()[:12]
    dtypes = [f"{c}:{pdf[c].dtype}" for c in cols]
    return digest, len(pdf), dtypes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset (default: every registered query)",
    )
    ap.add_argument(
        "--forced-branches",
        action="store_true",
        help="set HCS_CC_DRIVER_MAX_PAIRS=0 / HCS_MERGE_KEY_PROBE_CAP=0 "
        "and wipe the affected memos BEFORE importing the workload "
        "modules, so the distributed production branches (label "
        "propagation, every-file merge candidates) run under the same "
        "oracle compare; pair with --queries for the 4 branch queries",
    )
    ap.add_argument(
        "--with-forced",
        action="store_true",
        help="after the main sweep, run the forced-branch subset in a "
        "SUBPROCESS (the caps are read at module import) and embed its "
        "rows under a 'forced_branches' key in the same artifact",
    )
    args = ap.parse_args()
    if args.forced_branches:
        # caps are read at workload-module IMPORT time — set them
        # before __spark_entry__ is imported below, and wipe the memo
        # trees the capped builders materialize so they rebuild under
        # the forced branch instead of serving the fast-path tree
        import shutil
        import tempfile

        os.environ["HCS_CC_DRIVER_MAX_PAIRS"] = "0"
        os.environ["HCS_MERGE_KEY_PROBE_CAP"] = "0"
        # r10 forced branches: oversized-cluster salted split (cap 40
        # splits every fixture cluster) and the shuffled MOR anti-join
        # (broadcast threshold 0)
        os.environ["HCS_SEMANTIC_SPLIT_CAP"] = "40"
        os.environ["HCS_MOR_BROADCAST_ROWS"] = "0"
        sf_name = os.path.basename(args.sf_dir.rstrip("/"))
        for tag in _FORCED_WIPE_TAGS:
            for d in glob.glob(
                os.path.join(tempfile.gettempdir(), f"hcs_{tag}_{sf_name}_*")
            ):
                shutil.rmtree(d, ignore_errors=True)
    rnd = args.round if args.round is not None else _default_round()
    out_path = args.out or os.path.join(_REPO, f"ORACLE_FULL_r{rnd:02d}.json")

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from hbase_compact_spark.tables import TABLE_NAMES

    builder = SparkSession.builder.master("local[8]")
    # the driver's own sweep runs at sf0.01 where the default 1g heap
    # is ample; the sf1 artifact run needs headroom for 10x the data
    # (opt-in knob, default session otherwise — config assumptions
    # must still surface here first)
    mem = os.environ.get("ORACLE_SWEEP_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        # sf1 rehearsal tables are DIRECTORIES of part files
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    if args.queries:
        wanted = args.queries.split(",")
        queries = {n: queries[n] for n in wanted}
    results: dict[str, dict] = {}
    n_hash_green = n_rows_only = n_fail = 0
    from hbase_compact_spark import registry as _registry

    def _session_stopped() -> bool:
        try:
            return spark.sparkContext._jsc.sc().isStopped()
        except Exception:
            return True

    def _rebuild_session():
        # a hypervisor stall (or a fatal error in a daemon thread) can
        # shut the local SparkContext down MID-SWEEP; without recovery
        # every later query fails on the dead context and one bad
        # minute of machine weather poisons the whole artifact
        nonlocal spark
        try:
            spark.stop()
        except Exception:
            pass
        b = SparkSession.builder.master("local[8]")
        if mem:
            b = b.config("spark.driver.memory", mem)
        spark = b.getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")

    for name in sorted(queries):
        row = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            "seconds": None,
        }
        for attempt in (1, 2):
            # drop session-scoped shared-intermediate caches between
            # queries (same discipline as bench.py): at sf1+ the
            # accumulated persisted frames of earlier queries fill the
            # default session's storage pool and a later query's
            # broadcast build dies with UNABLE_TO_ACQUIRE_MEMORY — a
            # harness artifact, not an engine one
            _registry.clear_session_caches()
            row["err"] = None
            t0 = time.perf_counter()
            try:
                sdf = queries[name](spark, args.sf_dir)
                if name not in oracles:
                    # rows-only: the compare needs only the row COUNT
                    # — collecting a data-proportional result (e.g.
                    # bin_packing_plan's per-file plan, millions of
                    # rows at sf1+) to pandas would fail the HARNESS,
                    # not the query
                    row["spark_rows"] = sdf.count()
                    row["err"] = "no_oracle"
                    n_rows_only += 1
                else:
                    pdf = sdf.toPandas()
                    row["spark_rows"] = len(pdf)
                    hs, ns, ds = _hash_pdf(pdf)
                    opdf = con.execute(oracles[name]).fetchdf()
                    ho, no, do = _hash_pdf(opdf)
                    row["oracle_rows"] = no
                    row["rows_match"] = ns == no
                    row["schema_match"] = ds == do
                    row["hash_match"] = hs == ho
                    if row["hash_match"]:
                        n_hash_green += 1
                    else:
                        n_fail += 1
                break
            except Exception as exc:
                row["err"] = f"{type(exc).__name__}: {exc}"[:300]
                if _session_stopped() and attempt == 1:
                    print(
                        f"{name}: SparkContext died mid-query — "
                        "rebuilding the session and retrying once",
                        flush=True,
                    )
                    _rebuild_session()
                    continue
                n_fail += 1  # record, keep sweeping
                break
        row["seconds"] = round(time.perf_counter() - t0, 3)
        results[name] = row
        status = (
            "MATCH"
            if row["hash_match"]
            else ("rows-only" if row["err"] == "no_oracle" else "FAIL")
        )
        print(f"{name:28s} {status:9s} {row['seconds']:7.2f}s", flush=True)

    forced = None
    if args.with_forced:
        import subprocess
        import tempfile

        ftmp = os.path.join(
            tempfile.gettempdir(), f"oracle_forced_r{rnd:02d}.json"
        )
        fqueries = (
            "dedup_clusters,dedup_canonical,"
            "snapshot_merge_scan,snapshot_cdc_scan,"
            "dedup_semantic,snapshot_mor_delete_scan,"
            "snapshot_eqdelete_scan,snapshot_mor_upsert_scan,"
            "snapshot_merge_full"
        )
        rc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--sf-dir",
                args.sf_dir,
                "--forced-branches",
                "--queries",
                fqueries,
                "--round",
                str(rnd),
                "--out",
                ftmp,
            ],
            check=False,
        ).returncode
        with open(ftmp) as f:
            fdata = json.load(f)
        forced = {
            "caps": {
                "HCS_CC_DRIVER_MAX_PAIRS": "0",
                "HCS_MERGE_KEY_PROBE_CAP": "0",
                "HCS_SEMANTIC_SPLIT_CAP": "40",
                "HCS_MOR_BROADCAST_ROWS": "0",
            },
            "memos_wiped": list(_FORCED_WIPE_TAGS),
            "subprocess_rc": rc,
            **{k: v for k, v in fdata.items() if k != "_meta"},
        }
        n_fail += sum(
            1
            for k, v in fdata.items()
            if k != "_meta"
            and isinstance(v, dict)
            and v.get("hash_match") is not True
        )

    payload = {
        "_meta": {
            "sf_dir": args.sf_dir,
            "round": rnd,
            "n_queries": len(results),
            "n_hash_green": n_hash_green,
            "n_rows_only": n_rows_only,
            "n_fail": n_fail,
            "compare": "rows+schema+order-insensitive value hash (driver-identical)",
        },
        **results,
    }
    if forced is not None:
        payload["forced_branches"] = forced
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(
        f"\n{out_path}: {n_hash_green} hash-green + {n_rows_only} rows-only, "
        f"{n_fail} failures"
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
