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


def test_rowdigest_modes_agree():
    """RowDigest: order-insensitive equality in exact and promoted modes,
    mode chosen purely by row count, mismatches detected in both."""
    import importlib

    import selfcheck as sc

    importlib.reload(sc)
    rows = [(1, "a", 2.5), (2, "b", float("nan")), (1, "a", 2.5), (None, "c", -0.0)]

    def dig(data, promote):
        sc._HASH_PROMOTE = promote
        d = sc.RowDigest(["x", "y", "z"])
        for r in data:
            d.add_row(r)
        return d

    # exact mode, order-insensitive
    assert dig(rows, 1000).matches(dig(list(reversed(rows)), 1000))
    # digest mode, order-insensitive
    assert dig(rows, 2).matches(dig(list(reversed(rows)), 2))
    # mixed mode cannot arise for equal counts, but must still compare
    assert dig(rows, 2).matches(dig(rows, 1000))
    # a changed value fails in both modes
    bad = rows[:-1] + [(None, "c", 0.5)]
    assert not dig(rows, 1000).matches(dig(bad, 1000))
    assert not dig(rows, 2).matches(dig(bad, 2))
    # a missing row fails on count
    assert not dig(rows, 2).matches(dig(rows[:-1], 2))
    sc._HASH_PROMOTE = 2_000_000
