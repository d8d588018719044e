#!/usr/bin/env python
"""Interleaved control-vs-HEAD benchmark (VERDICT r12 task 6).

Runs bench.py alternately against a CONTROL git worktree (the
previous round's tree, unchanged) and the current HEAD —
A/B/A/B in one quiet session window — then writes:

- BENCH_BASE_r{N}.json   : per-query MIN across the A (control) arms
  plus an `arms` list with each arm's totals;
- BENCH_AB_r{N}.json     : both arms' totals, the per-arm same-tree
  spread (the measured noise band for identical code), and the
  control-vs-HEAD per-query comparison restricted to queries present
  in both trees.

Interleaving is the point: each arm of each tree sees the same box
drift, so control-vs-HEAD deltas larger than the same-tree spread
are code, anything inside it is box. (r12's closing-vs-control delta
was unattributable precisely because the two benches ran hours apart
on different box states.)

    python tools_bench_ab.py --control-ref <sha> --round N [--arms 2]

Each bench.py invocation is a fresh process (its own SparkSession),
run from its tree's own directory with SPARK_GRAFT_SF_DIR inherited.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

_REPO = Path(__file__).resolve().parent


def _run_bench(tree: Path) -> dict:
    out = subprocess.run(
        [sys.executable, str(tree / "bench.py")],
        cwd=str(tree),
        capture_output=True,
        text=True,
        timeout=3600,
    )
    last = [
        ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")
    ]
    if not last:
        raise RuntimeError(
            f"bench in {tree} produced no JSON line:\n{out.stderr[-2000:]}"
        )
    return json.loads(last[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--control-ref", required=True)
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--arms", type=int, default=2)
    args = ap.parse_args()

    ctrl = Path(tempfile.mkdtemp(prefix="hcs_ab_ctrl_")) / "tree"
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(ctrl), args.control_ref],
        cwd=str(_REPO),
        check=True,
    )
    try:
        runs: dict[str, list[dict]] = {"control": [], "head": []}
        for arm in range(args.arms):
            runs["control"].append(_run_bench(ctrl))
            print(
                f"A{arm} control total={runs['control'][-1]['value']}",
                flush=True,
            )
            runs["head"].append(_run_bench(_REPO))
            print(f"B{arm} head total={runs['head'][-1]['value']}", flush=True)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(ctrl)],
            cwd=str(_REPO),
        )

    def _merge(arms: list[dict]) -> dict:
        # per-query MIN across arms: the least-contended observation
        # of each query — medians within an arm already absorb warmup
        qs: dict[str, float] = {}
        for a in arms:
            for k, v in a["queries"].items():
                qs[k] = min(qs.get(k, float("inf")), v)
        return qs

    ctrl_q, head_q = _merge(runs["control"]), _merge(runs["head"])

    def _same_tree_spread(arms: list[dict]) -> dict:
        if len(arms) < 2:
            return {}
        a, b = arms[0]["queries"], arms[1]["queries"]
        ratios = sorted(
            round(b[k] / a[k], 3) for k in a if k in b and a[k] > 0
        )
        return {
            "ratio_min": ratios[0],
            "ratio_median": ratios[len(ratios) // 2],
            "ratio_max": ratios[-1],
            "n": len(ratios),
        }

    base = {
        "metric": "total_runtime_all_queries",
        "queries": ctrl_q,
        "aggregation": "min of interleaved arms (median-of-3 within arm)",
        "sf": runs["control"][0]["sf"],
        "n_queries_timed": len(ctrl_q),
        "n_failures": runs["control"][-1]["n_failures"],
        "control_ref": args.control_ref,
        "arms": [a["value"] for a in runs["control"]],
        "unit": "sec",
        "value": round(sum(ctrl_q.values()), 3),
    }
    with open(_REPO / f"BENCH_BASE_r{args.round:02d}.json", "w") as f:
        json.dump(base, f, separators=(",", ":"))

    common = [k for k in ctrl_q if k in head_q]
    ab = {
        "what": "interleaved A/B/A/B control-vs-HEAD bench in one "
        "session window; same-tree spread = measured noise floor for "
        "identical code on this box",
        "control_ref": args.control_ref,
        "control_arm_totals": [a["value"] for a in runs["control"]],
        "head_arm_totals": [a["value"] for a in runs["head"]],
        "control_total_minmerged": round(sum(ctrl_q.values()), 3),
        "head_total_minmerged": round(sum(head_q.values()), 3),
        "same_tree_spread": {
            "control": _same_tree_spread(runs["control"]),
            "head": _same_tree_spread(runs["head"]),
        },
        "common_queries": {
            "n": len(common),
            "control_sum": round(sum(ctrl_q[k] for k in common), 3),
            "head_sum": round(sum(head_q[k] for k in common), 3),
        },
        "head_noise_band": runs["head"][-1].get("noise_band"),
    }
    with open(_REPO / f"BENCH_AB_r{args.round:02d}.json", "w") as f:
        json.dump(ab, f, indent=1)
    print(json.dumps(ab["common_queries"]))
    print("same-tree spread:", json.dumps(ab["same_tree_spread"]))


if __name__ == "__main__":
    main()
