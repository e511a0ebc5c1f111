"""Adversarial distribution-shift fixture (round-7 fuzz axis).

The sf1/sf10 upscales preserve sf0.1's *distributions*; this variant
changes the *shape* while keeping every FK edge valid, so the full
oracle corpus can be value-checked where the data is hostile:

- **Heavy skew**: supplier 0 owns ~30% of lineitem rows and user 0 owns
  ~30% of events — the hot-key regime AQE skew-split and the salted
  joins exist for, now value-checked, not just plan-checked.
- **Degenerate text**: every 50th document is the empty string, every
  50th+1 whitespace-only, every 50th+2 unicode (accents, CJK, an
  astral-plane emoji), every 50th+3 a single repeated word ×200
  (pathological shingle/minhash input). n_chars is recomputed so its
  LENGTH(text) invariant holds.
- **Boundary decimals**: every 997th order's o_totalprice snaps to
  ±99999999.99 (the DECIMAL(10,2) rail) — sums cross 2^53-unscaled
  territory and sign edges.
- **Duplicate timestamps**: events for users 1-20 have ts truncated to
  the hour — massive per-key ties, the regime where any nondeterministic
  tie-break diverges from the oracle.

Pure DuckDB transforms of the read-only source; rerun-identical.
Output: /root/repo/.scale/fuzz/*.parquet (gitignored).
Usage: python tools/make_fuzz.py [src_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "fuzz"
)

# the four hostile text shapes (doc_id % 50 selects them)
_UNICODE = "héllo wörld 你好 世界 🌍 naïve façade Ñandú"
_REPEAT = " ".join(["dup"] * 200)

SQL = {
    # ~30% of lineitem rows move to supplier 0 (deterministic: hash of the
    # row key, not RNG) — FK stays valid, supplier 0 becomes the hot key
    "lineitem": """
        SELECT l_orderkey, l_partkey,
               CASE WHEN hash(l_orderkey * 7 + l_linenumber) % 10 < 3
                    THEN 0 ELSE l_suppkey END AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM src
    """,
    # boundary decimals on the money rail, both signs
    "orders": """
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % 997 = 0 THEN 99999999.99
                    WHEN o_orderkey % 997 = 1 THEN -99999999.99
                    ELSE o_totalprice END AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM src
    """,
    # user 0 owns ~30% of events; users 1-20 get hour-truncated ts (ties)
    "events": """
        SELECT event_id, ts AS ts_orig,
               CASE WHEN user_id BETWEEN 1 AND 20
                    THEN date_trunc('hour', ts) ELSE ts END AS ts,
               CASE WHEN hash(event_id * 13) % 10 < 3 THEN 0 ELSE user_id END AS user_id,
               event_type, value, props
        FROM src
    """,
    "documents": f"""
        SELECT doc_id,
               CASE doc_id % 50
                    WHEN 0 THEN ''
                    WHEN 1 THEN '   \t\n  '
                    WHEN 2 THEN '{_UNICODE}'
                    WHEN 3 THEN '{_REPEAT}'
                    ELSE text END AS text,
               lang, source,
               LENGTH(CASE doc_id % 50
                    WHEN 0 THEN ''
                    WHEN 1 THEN '   \t\n  '
                    WHEN 2 THEN '{_UNICODE}'
                    WHEN 3 THEN '{_REPEAT}'
                    ELSE text END) AS n_chars
        FROM src
    """,
}

COPY_AS_IS = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "embeddings",
)


def main() -> None:
    con = duckdb.connect()
    os.makedirs(DST, exist_ok=True)
    for t in COPY_AS_IS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
        print(f"{t}: copied")
    for t, sql in SQL.items():
        out = f"{DST}/{t}.parquet"
        # events: drop the helper ts_orig column before writing
        body = sql.replace("ts AS ts_orig,\n", "") if t == "events" else sql
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{t}.parquet'")
        con.execute(f"COPY ({body}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"{t}: {n} rows")
    # shape assertions: the skew really is skew
    top = con.execute(
        f"SELECT l_suppkey, COUNT(*) c FROM '{DST}/lineitem.parquet' "
        "GROUP BY 1 ORDER BY c DESC LIMIT 1"
    ).fetchone()
    tot = con.execute(f"SELECT COUNT(*) FROM '{DST}/lineitem.parquet'").fetchone()[0]
    print(f"hot supplier {top[0]} owns {top[1]}/{tot} = {top[1]/tot:.1%} of lineitem")


if __name__ == "__main__":
    main()
