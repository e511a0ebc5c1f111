"""Deterministic TIME-EXTENDED sf10: 100 key-shifted AND time-shifted
shards of sf0.1.

Why a second sf10 construction exists: `make_sf1.py 100 .scale/sf10`
(the density-preserving construction) keeps the source's date/time range
while multiplying rows 100x, so *time density* grows 100x. That is a
deliberate stress for most operators, but it makes the output of a
date-proximity join grow quadratically — join_range_binned's result is
4.8M rows at sf0.1, 481.7M at sf1 (exactly 100x, measured r6), and
~48.2B at sf10: the value-check cost at sf10 is then dominated by an
upscale ARTIFACT, not by anything a plan does (SCALE.md r6 documents the
same artifact for the sf0.1→sf1 decade). Real corpora grow the other way
too: more history, not infinitely denser history.

This construction shifts each shard's time axis so shards are
time-DISJOINT (shard i: orders/lineitem dates +i*8 years, events
timestamps +i*1 year — under the TIMESTAMP(NANOS) year-2262 int64 cap
for 100 shards). Interval/date-proximity joins then produce exactly
100x shard 0's pairs (no cross-shard matches by construction), i.e. the
output scales LINEARLY with data — which is what makes a full-value
digest check of the interval-join family feasible at the sf10 decade.
Everything else matches make_sf1.py shard-for-shard (same key offsets,
same FK co-shifts, same per-shard document suffixes).

NULL timestamps pass through untouched (ts + INTERVAL propagates NULL).

Usage: python tools/make_sf10t.py [n_shards] [dst_dir]
(defaults: 100 shards -> /root/repo/.scale/sf10t)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf10t"
)

# identical key offsets to make_sf1.py — shard = key // offset either way
C_OFF = 1_000_000
S_OFF = 100_000
P_OFF = 1_000_000
O_OFF = 10_000_000
E_OFF = 1_000_000
U_OFF = 10_000
D_OFF = 100_000
V_OFF = 100_000


def shard_sql(i: int) -> dict[str, str]:
    suffix = (
        "text" if i == 0 else f"regexp_replace(text, '(\\S+)', '\\1_{i}', 'g')"
    )
    # 8 years > the TPC-H 1992-1998 date span, so shard date ranges are
    # disjoint; 1 year > the events fixture's per-user span (~30 days),
    # so shard ts ranges are disjoint and 100 shards stay < year 2262
    dshift = f"+ INTERVAL {i * 8} YEAR" if i else ""
    tshift = f"+ INTERVAL {i} YEAR" if i else ""
    return {
        "customer": f"""
            SELECT c_custkey + {i * C_OFF} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM src""",
        "supplier": f"""
            SELECT s_suppkey + {i * S_OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
            FROM src""",
        "part": f"""
            SELECT p_partkey + {i * P_OFF} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM src""",
        "orders": f"""
            SELECT o_orderkey + {i * O_OFF} AS o_orderkey,
                   o_custkey + {i * C_OFF} AS o_custkey,
                   o_orderstatus, o_totalprice,
                   CAST(o_orderdate {dshift} AS DATE) AS o_orderdate,
                   o_orderpriority
            FROM src""",
        "lineitem": f"""
            SELECT l_orderkey + {i * O_OFF} AS l_orderkey,
                   l_partkey + {i * P_OFF} AS l_partkey,
                   l_suppkey + {i * S_OFF} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                   l_returnflag, l_linestatus,
                   CAST(l_shipdate {dshift} AS DATE) AS l_shipdate
            FROM src""",
        "events": f"""
            SELECT event_id + {i * E_OFF} AS event_id,
                   ts {tshift} AS ts,
                   user_id + {i * U_OFF} AS user_id, event_type, value, props
            FROM src""",
        "documents": f"""
            SELECT doc_id + {i * D_OFF} AS doc_id, {suffix} AS text, lang, source,
                   CAST(LENGTH({suffix}) AS BIGINT) AS n_chars
            FROM src""",
        "embeddings": f"""
            SELECT vec_id + {i * V_OFF} AS vec_id, embedding, label
            FROM src""",
    }


def main() -> None:
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    global DST
    if len(sys.argv) > 2:
        DST = os.path.abspath(sys.argv[2])
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")
    for t in shard_sql(0).keys():
        con.execute(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )
        union = "\nUNION ALL\n".join(shard_sql(i)[t] for i in range(n_shards))
        con.execute(f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
