"""operators/graph.pagerank — numeric fixed-point iteration checked
against an independent numpy power iteration on a hand-built graph
(dangling node included), plus the registered pagerank_trade query's
structural invariants."""

from __future__ import annotations

import numpy as np
import pytest

from hbase_compact_spark.operators.graph import pagerank


def _numpy_pagerank(edges, iters, damping):
    """Independent dense power iteration. edges: [(src, dst, w)]."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_w = {}
    for s, _d, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    # column-stochastic transition (dst rows, src cols)
    m = np.zeros((n, n))
    for s, d, w in edges:
        m[idx[d], idx[s]] += w / out_w[s]
    dangling = np.array([nodes[i] not in out_w for i in range(n)])
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        dm = pr[dangling].sum()
        pr = (1.0 - damping) / n + damping * (m @ pr + dm / n)
    return {nodes[i]: pr[i] for i in range(n)}


def test_pagerank_matches_numpy_power_iteration(spark):
    # 5 nodes; E is dangling (only a destination); weighted edges.
    edges = [
        ("A", "B", 3),
        ("A", "C", 1),
        ("B", "C", 2),
        ("C", "A", 1),
        ("C", "E", 1),
        ("D", "A", 5),
        ("B", "D", 1),
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    got = {
        r["node"]: r["pr"]
        for r in pagerank(df, iters=8, damping=0.85).collect()
    }
    want = _numpy_pagerank(edges, iters=8, damping=0.85)
    assert set(got) == set(want)
    for node, pr in want.items():
        assert got[node] == pytest.approx(pr, abs=1e-12), node
    # mass conservation: teleport + damped mass (incl. redistributed
    # dangling mass) always sums to exactly 1 per round
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_trade_query_invariants(spark, sf_dir):
    from hbase_compact_spark.workload_olap import pagerank_trade

    rows = pagerank_trade(spark, sf_dir).collect()
    assert len(rows) == 25  # every nation trades at every sf
    total = sum(r["pr"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-3)  # rounded to 6 each
    assert all(r["pr"] > 0 for r in rows)


def test_pagerank_trade_no_growing_broadcast_hints(spark):
    """The only broadcast hints inside pagerank are the two 1-row
    scalar frames (node count, dangling mass); the dimension joins in
    the query source must stay unhinted so AQE decides at scale."""
    import inspect

    import hbase_compact_spark.workload_olap as olap

    src = inspect.getsource(olap.pagerank_trade)
    assert "F.broadcast" not in src
