"""Pin the shard_check predicate's partition invariant (r11, ADVICE).

The proof tool's whole claim — n green shards == one green full-value
check — rests on the shard predicates PARTITIONING the keyspace. The
bare ``col % n = k`` form silently violates it for negative keys (Spark
and DuckDB ``%`` keep the dividend's sign, so a negative key matches no
k in 0..n-1); the pmod form ``((col % n) + n) % n = k`` covers them.
These tests pin the fixed form on BOTH engines over a keyset that
includes negatives, zero, and NULL, and pin the regression (the bare
form really does drop rows) so the fix can't be "simplified" back.
"""

from __future__ import annotations

import duckdb
import pytest


import sys

sys.path.insert(0, "/root/repo/tools")


def _pred(col: str, n: int, k: int) -> str:
    # THE shared builder itself (r12, ADVICE): every lane — shard_check's
    # wrap/push/inject paths and count_shards — now calls this one
    # function, so the tests pin the real predicate, not a copy of it.
    from shard_check import shard_predicate

    return shard_predicate(col, k, n)


KEYS = [-17, -5, -1, 0, 1, 5, 17, None]
N = 4


def test_pmod_predicate_partitions_duckdb():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({'NULL' if k is None else k})" for k in KEYS)
        + ") v(key)"
    )
    per_shard = [
        con.execute(
            f"SELECT count(*) FROM t WHERE {_pred('key', N, k)}"
        ).fetchone()[0]
        for k in range(N)
    ]
    assert sum(per_shard) == len(KEYS), per_shard
    # every row in exactly one shard: pairwise disjoint <=> sum == total
    # AND each shard's rows are a subset of t (trivially true for WHERE)
    bare = [
        con.execute(
            f"SELECT count(*) FROM t WHERE "
            f"((key IS NULL AND {k} = 0) OR key % {N} = {k})"
        ).fetchone()[0]
        for k in range(N)
    ]
    # the regression: the bare form loses the negative keys
    assert sum(bare) == len(KEYS) - 3, bare


def test_pmod_predicate_partitions_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(k,) for k in KEYS], "key int")
    per_shard = [
        df.filter(F.expr(_pred("key", N, k))).count() for k in range(N)
    ]
    assert sum(per_shard) == len(KEYS), per_shard


def test_engines_agree_on_shard_assignment(spark):
    """Same key lands in the same shard on both engines — required for
    the per-shard digests to compare like-for-like."""
    from pyspark.sql import functions as F

    con = duckdb.connect()
    for k_val in [-17, -5, -1, 0, 1, 5, 17]:
        duck_shard = [
            k
            for k in range(N)
            if con.execute(
                f"SELECT {_pred(str(k_val), N, k)}"
            ).fetchone()[0]
        ]
        spark_shard = [
            k
            for k in range(N)
            if spark.range(1)
            .filter(F.expr(_pred(str(k_val), N, k)))
            .count()
        ]
        assert duck_shard == spark_shard and len(duck_shard) == 1, (
            k_val,
            duck_shard,
            spark_shard,
        )
