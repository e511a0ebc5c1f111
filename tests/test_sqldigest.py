"""Unit gates for the sql-digest compare lane (tools/selfcheck.py:
sqldigest_compare), the engine-side aggregate digest that value-checks
queries whose oracle output is too big to stream (join_range_binned's
481M rows at sf1).

The load-bearing property pinned here is the r10 length-prefix fix: the
row canonicalization used to join fields with a bare '|', so two
GENUINELY DIFFERENT row sets — ('a|b','c') vs ('a','b|c') — concatenated
to the same string, digest-equal, and a real divergence in a
digest-checked query could pass silently. Fields are now netstring-style
length-prefixed ("len:value") on both engines, making the encoding a
prefix code (no two distinct rows share a concat). These tests fail if
either side ever loses the prefix.
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

_spec = importlib.util.spec_from_file_location(
    "dbs_selfcheck", "/root/repo/tools/selfcheck.py"
)
_selfcheck = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_selfcheck)
sqldigest_compare = _selfcheck.sqldigest_compare


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _df(spark, rows):
    return spark.createDataFrame(rows, "a string, b string")


def test_digest_matches_identical_rows(spark, con):
    sdf = _df(spark, [("a|b", "c"), ("x", None)])
    problems, n = sqldigest_compare(
        con, sdf, "SELECT 'a|b' AS a, 'c' AS b UNION ALL SELECT 'x', NULL"
    )
    assert problems == [] and n == 2


def test_digest_catches_separator_shift(spark, con):
    """The exact ambiguity the bare-'|' encoding had: same characters,
    different field boundaries. Must mismatch."""
    sdf = _df(spark, [("a|b", "c")])
    problems, _ = sqldigest_compare(con, sdf, "SELECT 'a' AS a, 'b|c' AS b")
    assert problems, "('a|b','c') vs ('a','b|c') digest-collided"


def test_digest_catches_null_vs_sentinel_char(spark, con):
    """A value equal to the old NULL sentinel (\\x01) must not compare
    equal to an actual NULL (the length prefix distinguishes them: NULL
    propagates through concat and coalesces to the bare sentinel, a real
    '\\x01' value encodes as '1:\\x01')."""
    sdf = _df(spark, [("\x01", "z")])
    problems, _ = sqldigest_compare(con, sdf, "SELECT NULL AS a, 'z' AS b")
    assert problems, "literal \\x01 value digest-collided with NULL"


def test_digest_catches_value_divergence_and_rowcount(spark, con):
    sdf = _df(spark, [("a", "b")])
    problems, _ = sqldigest_compare(con, sdf, "SELECT 'a' AS a, 'X' AS b")
    assert problems
    problems, _ = sqldigest_compare(
        con, sdf, "SELECT 'a' AS a, 'b' AS b UNION ALL SELECT 'a', 'b'"
    )
    assert any("rowcount" in p for p in problems)


def test_digest_sums_integral_columns(spark, con):
    """Per-column exact sums ride along for numeric columns — a swap
    between two rows' numeric cells that happens to keep the md5-prefix
    SUM stable (it can't, but belt-and-suspenders) is still caught by
    the column sums; here: a plain value difference in a bigint."""
    sdf = spark.createDataFrame([(1, "x"), (5, "y")], "n bigint, s string")
    problems, n = sqldigest_compare(
        con,
        sdf,
        "SELECT CAST(1 AS BIGINT) AS n, 'x' AS s UNION ALL SELECT 5, 'y'",
    )
    assert problems == [] and n == 2
    problems, _ = sqldigest_compare(
        con,
        sdf,
        "SELECT CAST(2 AS BIGINT) AS n, 'x' AS s UNION ALL SELECT 4, 'y'",
    )
    assert problems
