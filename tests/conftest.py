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


@pytest.fixture(scope="session")
def plan_for(spark, sf_dir):
    """Session-memoized registry plan builder. Several operators run real
    Spark jobs at plan-BUILD time (plan-time pivot discovery, iterative
    k-means/graph loops with collect edges); test_oracle and the registry
    schema scan each build every oracled plan, so without memoization the
    suite pays those jobs twice (the ADVICE r4 heaviness note).
    DataFrames are immutable plans — reuse is safe."""
    from data_bridge_spark.registry import load_all

    reg = load_all()
    cache: dict[str, object] = {}

    def get(name: str):
        if name not in cache:
            cache[name] = reg[name].fn(spark, sf_dir)
        return cache[name]

    return get
