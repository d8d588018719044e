"""Iterative graph operators over edge DataFrames.

`pagerank` is the numeric fixed-point companion to the min-label
propagation in workload_llm._dedup_cluster_labels (connected
components): the same iterate-join-aggregate shape, but propagating a
weighted score instead of a label. Generalizes the reference's
cross-product region x family fan-out (QHBaseCompact.java:144-146)
into link-structure analytics over an arbitrary edge list.

Scale notes (100 TB): every iteration is one shuffle on the node key
(contribution groupBy) plus one bounded 1-row aggregate for the
dangling mass — state is |nodes| rows, never |edges| x iters. The
rank frame is eagerly localCheckpoint'ed each round: it is consumed
TWICE per iteration (contribution join + dangling mass) and feeds the
next round, so without the barrier Catalyst would re-inline the whole
iteration history into every consumer (the projection-collapse trap
documented in STATE.md), and a lazy checkpoint would leave the two
consumers racing a nondeterministic recomputation. Normalized edges
are checkpointed ONCE and reused by every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 6,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over `edges` (columns: src, dst, weight).

    Returns (node, pr) with pr UNROUNDED — callers decide the
    presentation grain. Dangling nodes (appearing only as dst)
    redistribute their mass uniformly, the standard treatment.

    All scalars (node count, dangling mass) stay IN-PLAN as 1-row
    broadcast frames — no driver collect anywhere, so the operator is
    a pure DataFrame program a 1000-executor cluster runs unchanged.
    """
    spark = edges.sparkSession
    # materialize the edge list ONCE (r15): every derived frame below
    # (nodes, out-weights, normalized edges, dangling set) re-inlines
    # the caller's full edge-construction pipeline otherwise — for
    # pagerank_trade that is a fact x fact join re-executed per
    # consumer (measured: 2 full builds before, 1 after). The edge
    # BUILD runs under the caller's session conf (AQE on — it is the
    # corpus-scale stage and needs runtime re-planning/skew handling).
    edges = edges.select("src", "dst", "weight").localCheckpoint()
    # Everything past this point is GRAPH-metadata-scale (|edges| rows
    # post-aggregation, |nodes| state per round) with a FIXED 6-round
    # shape. AQE's per-query-stage materialization was measured at 93
    # Spark jobs per run at sf0.1 (25 nodes); for a fixed-shape
    # bounded iteration the runtime re-planning buys nothing (guide
    # §2.2 / VERDICT r15 task 6), so it is scoped OFF and the shuffle
    # width is derived from the measured edge count instead of the
    # session default — scale-adaptive, not a local-core-count tune.
    # Restored in `finally`; every frame the caller can touch is an
    # eager checkpoint, so no iteration compute escapes the scope.
    n_edges = edges.count()  # one cheap job on the checkpoint
    iter_parts = max(1, min(
        spark.sparkContext.defaultParallelism, n_edges // 1_000_000 + 1
    ))
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", None)
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(iter_parts))
    try:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint()
        )
        n_frame = nodes.agg(F.count("*").alias("n_nodes"))
        # transition probability: integer-ratio division (exact on both
        # engines when the oracle mirrors it)
        out_w = edges.groupBy("src").agg(F.sum("weight").alias("wout"))
        p_edges = (
            edges.join(out_w, "src")
            .select(
                "src",
                "dst",
                (F.col("weight").cast("double") / F.col("wout").cast("double")).alias("p"),
            )
            .localCheckpoint()
        )
        dangling = nodes.join(
            p_edges.select(F.col("src").alias("node")).distinct(),
            "node",
            "left_anti",
        ).localCheckpoint()

        teleport = F.lit(1.0) - F.lit(damping)
        pr = nodes.crossJoin(F.broadcast(n_frame)).select(
            "node", (F.lit(1.0) / F.col("n_nodes").cast("double")).alias("pr")
        ).localCheckpoint()

        for _ in range(iters):
            contrib = (
                pr.join(p_edges, pr["node"] == p_edges["src"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("pr") * F.col("p")).alias("contrib"))
            )
            dang = (
                pr.join(dangling, "node", "left_semi")
                .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm"))
            )
            pr = (
                nodes.join(contrib, "node", "left")
                .crossJoin(F.broadcast(dang))
                .crossJoin(F.broadcast(n_frame))
                .select(
                    "node",
                    (
                        teleport / F.col("n_nodes").cast("double")
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("contrib"), F.lit(0.0))
                            + F.col("dm") / F.col("n_nodes").cast("double")
                        )
                    ).alias("pr"),
                )
                .localCheckpoint()
            )
    finally:
        if prev_aqe is None:
            spark.conf.unset("spark.sql.adaptive.enabled")
        else:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        if prev_sp is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    return pr
