from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from data_bridge_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from data_bridge_spark.catalog import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


def plan_string(df) -> str:
    """Executed physical plan as text (shared by plan-assertion tests)."""
    return df._jdf.queryExecution().executedPlan().toString()
