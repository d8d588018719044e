#!/usr/bin/env python
"""Scale rehearsal: generate an ~sf1 dataset (10x the sf0.1 fixtures)
under /tmp and measure t(sf1)/t(sf0.1) for the shuffle-heaviest
queries — the observed-scaling evidence behind SCALING.md's plan-shape
claims.

    python tools_scaling.py generate   # build /tmp/hcs_scale/sf1
    python tools_scaling.py bench      # run the rehearsal set at both
                                       # sfs, print one JSON line

Generation is DETERMINISTIC and referential-integrity-preserving:
fact/dim tables are replicated 10x with per-copy key offsets (so
join fan-outs stay 1:1 with the original), while documents and
embeddings are SYNTHESIZED fresh from xxhash64-seeded draws over the
fixture vocabulary — replicating text verbatim would turn the corpus
into a pathological 10-way-duplicate dedup input whose pair count
grows quadratically in copies, measuring the data, not the plan.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SRC_SF = "/root/testdata/sf0.1"
OUT_DIR = "/tmp/hcs_scale/sf1"
COPIES = 10

# per-copy key offsets = max key + 1 of the sf0.1 fixture generation
OFFSETS = {
    "l_orderkey": 150_000,
    "o_orderkey": 150_000,
    "o_custkey": 15_000,
    "c_custkey": 15_000,
    "l_partkey": 20_000,
    "p_partkey": 20_000,
    "l_suppkey": 1_000,
    "s_suppkey": 1_000,
    "ps_partkey": 20_000,
    "event_id": 100_000,
    "user_id": 1_500,
}

# the shuffle-heaviest / most-expensive registered queries (BENCH r4
# top set) — the rehearsal sweep
REHEARSAL = [
    "groupby_stats",
    "rollup_total",
    "join_equi",
    "window_running",
    "percentile_dist",
    "sessionize",
    "interval_join",
    "asof_join",
    "dedup_exact",
    "dedup_fuzzy",
    "dedup_ngram_jaccard",
    "tfidf_top_terms",
    "token_heavy_hitters",
    "skew_salted_agg",
    "dedup_canonical",
    "length_outliers",
    "cooccurrence_pmi",
    "skew_salted_join",
    "stream_session",
    "compaction_execute",
    "funnel_conversion",
    "retention_cohorts",
    "stream_late_data",
]


def _spark() -> SparkSession:
    from hbase_compact_spark.session import get_spark

    return get_spark("scale_rehearsal")


def _replicate(spark: SparkSession, table: str) -> "F.DataFrame":
    """10 copies with key-offset columns shifted per copy. Events go
    through tables.load_table so every fixture timestamp encoding
    that has ever shipped (TIMESTAMP(NANOS)-as-long, NTZ, plain)
    normalizes instead of crashing schema inference."""
    from hbase_compact_spark.tables import load_table

    if table == "events":
        df = load_table(spark, SRC_SF, "events")
    else:
        df = spark.read.parquet(f"{SRC_SF}/{table}.parquet")
    copies = spark.range(COPIES).withColumnRenamed("id", "__copy")
    out = df.crossJoin(F.broadcast(copies))
    for col in df.columns:
        if col in OFFSETS:
            out = out.withColumn(
                col, F.col(col) + F.col("__copy") * F.lit(OFFSETS[col])
            )
    return out.drop("__copy")


def generate() -> None:
    spark = _spark()
    os.makedirs(OUT_DIR, exist_ok=True)
    # dims stay fixture-sized (they would be broadcast at any scale)
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC_SF}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT_DIR}/{t}.parquet")
    for t in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        n_out = {"lineitem": 16, "orders": 8, "events": 8}.get(t, 4)
        _replicate(spark, t).repartition(n_out).write.mode(
            "overwrite"
        ).parquet(f"{OUT_DIR}/{t}.parquet")

    # documents: synthesized from the fixture vocabulary, fresh draws
    src_docs = spark.read.parquet(f"{SRC_SF}/documents.parquet")
    n_docs = src_docs.count() * COPIES
    vocab = [
        r["w"]
        for r in src_docs.select(
            F.explode(F.split("text", " ")).alias("w")
        )
        .distinct()
        .collect()
    ]
    vocab_arr = F.array(*[F.lit(w) for w in sorted(vocab)])
    langs = F.array(*[F.lit(x) for x in ("de", "en", "es", "fr", "zh")])
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(
                        F.lit(0),
                        (F.pmod(F.xxhash64("id", F.lit(1)), 88) + 7).cast(
                            "int"
                        ),
                    ),
                    lambda p: F.element_at(
                        vocab_arr,
                        (
                            F.pmod(
                                F.xxhash64(F.col("doc_id"), p),
                                len(vocab),
                            )
                            + 1
                        ).cast("int"),
                    ),
                ),
            ).alias("text"),
            F.element_at(
                langs, (F.pmod(F.xxhash64("id", F.lit(2)), 5) + 1).cast("int")
            ).alias("lang"),
            F.concat(
                F.lit("src"), F.pmod(F.xxhash64("id", F.lit(3)), 20)
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    docs.repartition(8).write.mode("overwrite").parquet(
        f"{OUT_DIR}/documents.parquet"
    )

    # embeddings: 64-dim unit-range floats, xxhash-seeded
    n_vecs = (
        spark.read.parquet(f"{SRC_SF}/embeddings.parquet").count() * COPIES
    )
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda p: (
                F.pmod(F.xxhash64(F.col("vec_id"), p), 2000) / 1000.0 - 1.0
            ).cast("float"),
        ).alias("embedding"),
        F.pmod(F.xxhash64("id", F.lit(9)), 10).cast("int").alias("label"),
    )
    emb.repartition(4).write.mode("overwrite").parquet(
        f"{OUT_DIR}/embeddings.parquet"
    )
    print("generated", OUT_DIR)


def bench(queries: list[str] | None = None, runs: int = 3) -> None:
    import __spark_entry__ as entrymod
    from hbase_compact_spark import registry

    spark = _spark()
    qs = entrymod.queries()
    names = queries or [q for q in REHEARSAL if q in qs]
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, dict] = {}
    for name in names:
        row: dict[str, float] = {}
        for label, sf_dir in (("sf0.1", SRC_SF), ("sf1", OUT_DIR)):
            ts = []
            for _ in range(runs):
                registry.clear_session_caches()
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts.append(time.perf_counter() - t0)
            row[label] = round(sorted(ts)[len(ts) // 2], 3)
        row["ratio"] = round(row["sf1"] / max(row["sf0.1"], 1e-9), 2)
        out[name] = row
        print(name, row, flush=True)
    print(json.dumps({"rehearsal": out}, separators=(",", ":")))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "bench"
    if cmd == "generate":
        generate()
    elif cmd == "bench":
        qlist = sys.argv[2].split(",") if len(sys.argv) > 2 else None
        bench(qlist)
    else:
        raise SystemExit(f"unknown command {cmd!r}")
