"""Oracle-parity tests: every registered query vs DuckDB at sf0.001.

Same comparison as tools/selfcheck.py (and stricter than any value hash):
row count, sorted column names, exact canonical multiset of values.
"""

from __future__ import annotations

import pytest

from data_bridge_spark.registry import load_all

import sys

sys.path.insert(0, "/root/repo/tools")
from selfcheck import rowset  # noqa: E402

REG = load_all()
ORACLED = sorted(n for n, q in REG.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REG.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_matches_duckdb_oracle(name, spark, duck, sf_dir, plan_for):
    q = REG[name]
    sdf = plan_for(name)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows), f"rowcount {len(srows)} != {len(orows)}"
    assert sorted(scols) == sorted(ocols)
    assert rowset(scols, srows) == rowset(ocols, orows)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    assert REG[name].fn(spark, sf_dir).count() > 0
