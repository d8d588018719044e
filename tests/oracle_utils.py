"""Local mirror of the driver's DuckDB-oracle comparison.

The driver compares row-count + schema + order-insensitive value hash.
We reproduce that check (slightly stricter: exact cell-level equality
after canonicalization) so oracle breakage is caught in pytest before
a round's verify runs.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from hbase_compact_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return repr(v)  # full precision — catches sub-rounding drift
    return repr(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort()
    return out


def assert_matches_oracle(spark_df, sql: str, sf_dir: str) -> None:
    con = duck_connection(sf_dir)
    oracle_pdf = con.execute(sql).fetchdf()
    spark_pdf = spark_df.toPandas()

    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    dtype_diffs = [
        (c, str(spark_pdf[c].dtype), str(oracle_pdf[c].dtype))
        for c in spark_pdf.columns
        if str(spark_pdf[c].dtype) != str(oracle_pdf[c].dtype)
    ]
    assert not dtype_diffs, f"dtype mismatch (spark vs oracle): {dtype_diffs}"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
