"""Boundary-timestamp regression for the ordered-fold NULLS LAST key
(r8 verdict #3 / advice): before round 9, `_ts_key()` emulated NULLS LAST
by coalescing NULL ts to a 9999-12-31 sentinel — a REAL event at that
exact timestamp would interleave with the untimed tail by event_id
instead of sorting strictly before every NULL-ts row (ANSI/DuckDB order
real values before NULLs). The r9 rewrite leads the sort struct with an
explicit (ts IS NULL) flag; this test pins the collision case forever:
a real event AT the former sentinel value, mixed with NULL-ts rows whose
event_ids sort both below and above it, folded per user and compared
against DuckDB's native ORDER BY ts NULLS LAST on the same rows.
"""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from data_bridge_spark.operators.timeseries import _ts_key

BOUNDARY = dt.datetime(9999, 12, 31, 0, 0, 0)
ROWS = [
    # (user_id, event_id, ts, event_type): event_ids chosen so a bare
    # (ts-with-sentinel, event_id) sort would interleave the real
    # boundary row (event_id=5) between the untimed rows 1 and 9
    (1, 5, BOUNDARY, "boundary"),
    (1, 1, None, "untimed_lo"),
    (1, 9, None, "untimed_hi"),
    (1, 3, dt.datetime(2024, 1, 2, 3, 4, 5), "normal"),
]


def test_boundary_ts_sorts_before_null_tail(spark):
    df = spark.createDataFrame(
        ROWS, "user_id int, event_id int, ts timestamp_ntz, event_type string"
    )
    seq = (
        df.groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(*_ts_key(), "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ).alias("seq")
        )
        .collect()[0]["seq"]
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (user_id INT, event_id INT, ts TIMESTAMP, event_type VARCHAR)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?)", ROWS)
    oracle = [
        r[0]
        for r in con.execute(
            "SELECT event_type FROM ev ORDER BY ts NULLS LAST, event_id"
        ).fetchall()
    ]

    assert oracle == ["normal", "boundary", "untimed_lo", "untimed_hi"]
    assert seq == oracle, f"fold order {seq} != oracle {oracle}"


def test_old_sentinel_would_have_failed(spark):
    """Pin WHY the flag field exists: the pre-r9 sentinel key produces the
    wrong order on exactly this fixture (boundary row interleaved into the
    untimed tail by event_id). If this ever starts passing, the engines'
    struct-ordering semantics changed and _ts_key deserves a fresh look."""
    df = spark.createDataFrame(
        ROWS, "user_id int, event_id int, ts timestamp_ntz, event_type string"
    )
    sentinel = F.coalesce(
        F.col("ts"), F.lit("9999-12-31 00:00:00").cast("timestamp_ntz")
    ).alias("ts")
    seq = (
        df.groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(sentinel, "event_id", "event_type"))),
                lambda s: s["event_type"],
            ).alias("seq")
        )
        .collect()[0]["seq"]
    )
    assert seq == ["normal", "untimed_lo", "boundary", "untimed_hi"]
    assert seq != ["normal", "boundary", "untimed_lo", "untimed_hi"]
