"""Oracle-differential parity for every registered SQL-expressible
query — the local mirror of the driver's t2 correctness gate, run at
the same scale factor (sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import assert_matches_oracle

SF_DIR = "/root/testdata/sf0.01"

_QUERIES = entrymod.queries()
_ORACLE = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_parity(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, _ORACLE[name], SF_DIR)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLE)))
def test_rows_only_queries_run(spark, name):
    # Non-SQL-expressible ops at least run and return a stable schema.
    df = _QUERIES[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
