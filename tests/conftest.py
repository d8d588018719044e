from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")


@pytest.fixture(scope="session")
def spark():
    from hbase_compact_spark.session import get_spark

    s = get_spark("hbase_compact_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # sf0.001 keeps the unit suite fast; oracle parity runs at sf0.01
    # in test_oracle_parity.py to mirror the driver.
    return "/root/testdata/sf0.001"
