"""Text-analysis column builders (LLM-pipeline extension surface).

All pure Spark SQL expressions — JVM-side, codegen-friendly, no
Python in the hot path — and each has a line-for-line DuckDB twin in
workload_llm.py so the oracle can replay it. The portable primitives:

* H(s): 60-bit integer hash = first 15 hex chars of md5, identical in
  any engine with md5 + hex parsing (Spark `conv`, DuckDB `::BIGINT`
  on a 0x literal).
* shingles: w-word windows over a single-space `split`.
* MinHash: k universal-hash mins over the shingle set,
  h_i(x) = (a_i * (H(x) mod p) + b_i) mod p,  p = 2^31 - 1,
  a_i = 2i + 3, b_i = 7919 i + 1  (deterministic, seedless).
* SimHash: 32-bit sign-aggregated token-hash sketch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MINHASH_K = 16
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
SIMHASH_BITS = 32

# languages with tiny stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ("the", "of", "and", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "les", "et", "des", "un"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("的", "了", "是", "我", "不"),
}


def hash60_sql(x: str) -> str:
    """Spark SQL: 60-bit md5-based hash of expression `x` (string)."""
    return f"CAST(conv(substr(md5({x}), 1, 15), 16, 10) AS BIGINT)"


def hash60_duck(x: str) -> str:
    """DuckDB twin of hash60_sql."""
    return f"CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def tokens(col: str = "text") -> Column:
    """Non-whitespace token array (regexp-based, robust to runs of
    whitespace — `split` would emit empties)."""
    return F.expr(rf"regexp_extract_all({col}, '\\S+', 0)")


TOKENS_DUCK = r"regexp_extract_all({col}, '\S+')"


def words(col: str = "text") -> Column:
    """Single-space word split (shingling substrate; fixture text is
    single-spaced)."""
    return F.split(F.col(col), " ")


def shingles(col: str = "text", w: int = 5) -> Column:
    """w-word shingles; documents shorter than w words contribute the
    whole text as one shingle so no document silently vanishes."""
    ws = words(col)
    return F.when(
        F.size(ws) < w, F.array(F.col(col))
    ).otherwise(
        F.expr(
            f"transform(sequence(1, size(split({col}, ' ')) - {w - 1}), "
            f"i -> concat_ws(' ', slice(split({col}, ' '), i, {w})))"
        )
    )


def shingles_duck(col: str = "text", w: int = 5) -> str:
    return (
        f"CASE WHEN len(string_split({col}, ' ')) < {w} THEN [{col}] "
        f"ELSE [array_to_string((string_split({col}, ' '))[i:i+{w - 1}], ' ') "
        f"for i in range(1, len(string_split({col}, ' ')) - {w - 2})] END"
    )


def min_shingle_md5(
    words_col: str, text_col: str = "text", w: int = 5
) -> Column:
    """min(md5(s)) over the w-word shingles — the 1-element MinHash —
    folded INCREMENTALLY with `aggregate` over shingle start
    positions: each shingle's md5 is compared against the running min
    and discarded. No shingle array, no md5 array, no array_distinct
    (duplicates cannot change a min); 2.8x faster than
    materialize-then-array_min at sf0.1. 'g' sorts after every md5
    hex digit [0-9a-f], so it is the identity for lexicographic
    least().

    `words_col` is a pre-split words array (see words()) so callers
    split the text once; the short-document fallback is md5(text) —
    exactly `shingles()`'s whole-text-as-one-shingle branch. MUST
    stay value-identical to `array_min(transform(shingles(text_col,
    w), s -> md5(s)))`; the DuckDB twin derives from shingles_duck()."""
    return F.when(
        F.size(F.col(words_col)) < w, F.md5(F.col(text_col))
    ).otherwise(
        F.expr(
            f"aggregate(sequence(1, size({words_col}) - {w - 1}), 'g', "
            f"(acc, i) -> least(acc, md5(concat_ws(' ', "
            f"slice({words_col}, i, {w})))))"
        )
    )


def shingle_hashes(shingle_col: str) -> Column:
    """H(s) mod p for each distinct shingle — materialized ONCE so the
    k MinHash lanes below reuse it (md5 is the expensive part; without
    this, each of the k lanes would recompute every shingle's md5)."""
    return F.expr(
        f"transform(array_distinct({shingle_col}), s -> "
        f"{hash60_sql('s')} % {MINHASH_P})"
    )


def minhash_signature(hash_col: str) -> Column:
    """k-element MinHash signature over a precomputed shingle-hash
    array column (see shingle_hashes).

    Pure SQL transform/aggregate — vectorized JVM execution, no UDF.
    `a*(H mod p)` stays under 2^36 so 64-bit arithmetic never
    overflows (ANSI-safe).
    """
    return F.expr(
        f"""
        transform(sequence(0, {MINHASH_K - 1}), i ->
          array_min(transform({hash_col}, h ->
            ((2*i + 3) * h + 7919*i + 1) % {MINHASH_P})))
        """
    )


def minhash_signature_duck(shingle_expr: str) -> str:
    return (
        f"[list_min(list_transform(list_distinct({shingle_expr}), "
        f"s -> ((2*i + 3) * ({hash60_duck('s')} % {MINHASH_P}) + 7919*i + 1) "
        f"% {MINHASH_P})) for i in range(0, {MINHASH_K})]"
    )


def token_hashes(token_col: str) -> Column:
    """H(t) for each token, materialized once (SimHash substrate —
    md5 runs per TOKEN, not per token x bit-lane)."""
    return F.expr(f"transform({token_col}, t -> {hash60_sql('t')})")


def simhash32(hash_col: str) -> Column:
    """32-bit SimHash over a precomputed token-hash array column (see
    token_hashes): bit j is set when more token-hashes have bit j set
    than not (sign aggregation). Folds 32 bit-lanes over longs —
    cheap relative to the hashing it reuses."""
    return F.expr(
        f"""
        aggregate(sequence(0, {SIMHASH_BITS - 1}), CAST(0 AS BIGINT),
          (acc, j) -> acc + CASE WHEN
            aggregate({hash_col}, 0, (v, h) ->
              v + CASE WHEN (shiftright(h, j) & 1) = 1
                       THEN 1 ELSE -1 END) > 0
            THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)
        """
    )


def simhash32_duck(token_expr: str) -> str:
    return (
        f"list_sum([CASE WHEN list_sum(list_transform({token_expr}, "
        f"t -> CASE WHEN (({hash60_duck('t')} >> j) & 1) = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN (1::BIGINT << j) ELSE 0::BIGINT END for j in range(0, {SIMHASH_BITS})])"
    )


def stopword_hits(token_col_name: str, lang: str) -> Column:
    """Occurrence count of `lang`'s stopwords in the named token-array
    column."""
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(
        f"aggregate({token_col_name}, 0, (acc, t) -> acc + "
        f"CASE WHEN lower(t) IN ({lst}) THEN 1 ELSE 0 END)"
    ).alias(f"hits_{lang}")


def stopword_hits_duck(token_expr: str, lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    # coalesce: DuckDB's list_sum([]) is NULL where the Spark twin's
    # aggregate(..., 0, ...) is 0 — an empty/whitespace-only document
    # must score 0 stopword hits in BOTH engines
    return (
        f"coalesce(list_sum(list_transform({token_expr}, t -> "
        f"CASE WHEN lower(t) IN ({lst}) THEN 1 ELSE 0 END)), 0)"
    )
