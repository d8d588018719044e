"""Skew mitigation: salted equi-join and salted two-phase aggregation.

AQE's runtime skew-join splitting (enabled in session.py) handles
most sort-merge-join skew transparently; salting is the STATIC
fallback for the cases AQE cannot rewrite — a handful of hot keys in
a shuffle aggregation, stream-stream joins (no runtime re-plan), or
a deliberately pre-partitioned pipeline that must not re-shuffle.
Both helpers are result-equivalent to their unsalted forms (asserted
in tests/test_semantics.py) — only the partition-level distribution
changes: a hot key's rows spread over `salt` reducers instead of one.

Generalizes the reference's fixed per-region fan-out (one region = one
work unit regardless of size, QHBaseCompact.java:146-193) into
size-aware work splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n: int) -> Column:
    """Deterministic pseudo-uniform salt in [0, n): a hash of the whole
    row, so retries and re-computations land identically (rand() would
    break exactly-once semantics under task retry)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n)).cast(
        "int"
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys spread over `salt`
    sub-partitions and the RIGHT side replicated `salt` times to
    match. Result-identical to `left.join(right, on, how)`; shuffle
    skew on the join key drops by ~`salt`x at the cost of a `salt`x
    fan-out of the (small) right side. For inner/left joins with a
    corpus-scale left and a moderate right — the shape where one hot
    key (a viral doc, an empty-string key) stalls a reducer.

    Only left-preserving join types are accepted: with the right side
    replicated, a right/full outer join would emit every unmatched
    RIGHT row `salt` times — silent duplication, so it is rejected."""
    allowed = {"inner", "left", "leftouter", "left_outer",
               "left_semi", "leftsemi", "left_anti", "leftanti",
               "semi", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "right side would duplicate unmatched right rows; use a "
            "left-preserving join type or salt the other side"
        )
    lt = left.withColumn("_salt", _salt_col(left, salt))
    rt = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = lt.join(rt, on + ["_salt"], how)
    return out.drop("_salt")


def salted_groupby_agg(
    df: DataFrame, keys: list[str], aggs: dict[str, str], *, salt: int = 16
) -> DataFrame:
    """Two-phase aggregation with an explicit salt stage: partial
    aggregate on (keys + salt) — hot keys spread over `salt` reducers
    — then final aggregate on keys. `aggs` maps output column ->
    "fn(col)" for the decomposable aggregates (count/sum/min/max).
    Spark's own partial/final HashAggregate already does this when the
    planner picks hash aggregation; the explicit form guarantees it
    for pipelines that would otherwise sort-aggregate, and documents
    the 100 TB recipe.

    Result-equivalence caveat: for fractional DOUBLE sums the salted
    merge order differs from the unsalted plan, so results agree only
    to float addition reordering (~1 ulp); bit-exact use cases should
    sum through a DECIMAL cast in the spec (nested casts parse fine),
    exactly like the registry's cross-engine hashing rules."""
    partial_exprs = []
    final_exprs = []
    for out_name, spec in aggs.items():
        # split at the FIRST paren and drop exactly the matching final
        # one — rstrip(')') would eat every trailing paren and mangle
        # nested expressions like sum(cast(x as decimal(20,6)))
        spec = spec.strip()
        if not spec.endswith(")") or "(" not in spec:
            raise ValueError(f"aggregate spec must be fn(col): {spec!r}")
        fn, col = spec[:-1].split("(", 1)
        fn = fn.strip().lower()
        p = f"_p_{out_name}"
        cexpr = None if col == "*" else F.expr(col)
        if fn == "count":
            partial_exprs.append(
                F.count(F.lit(1) if cexpr is None else cexpr).alias(p)
            )
            final_exprs.append(F.sum(p).alias(out_name))
        elif fn == "sum":
            partial_exprs.append(F.sum(cexpr).alias(p))
            final_exprs.append(F.sum(p).alias(out_name))
        elif fn == "min":
            partial_exprs.append(F.min(cexpr).alias(p))
            final_exprs.append(F.min(p).alias(out_name))
        elif fn == "max":
            partial_exprs.append(F.max(cexpr).alias(p))
            final_exprs.append(F.max(p).alias(out_name))
        else:
            raise ValueError(f"non-decomposable aggregate: {spec}")
    salted = df.withColumn("_salt", _salt_col(df, salt))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
