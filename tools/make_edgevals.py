"""Edge-values composed fixture (round 9): boundary-ERA values in every
column family, composed with per-row NULLs — the axis the r8 advice
called out (boundary timestamps) generalized to dates, decimals,
integers, and strings.

Why this axis exists: round 9 retired the ordered-fold NULL-ts sentinel
(9999-12-31) for an explicit null-flag struct field, making far-future
timestamps LEGAL input for the first time. This fixture makes them — and
the other type-boundary values the fuzz fixture's distribution never
reaches — a standing full-corpus regime:

- ``events.ts`` epoch pinning, per USER (all-or-nothing so per-user spans
  never grow — the gapfill/interpolate calendar spines stay bounded):
  users with hash%23==0 get their whole timeline shifted so max(ts) lands
  EXACTLY on TIMESTAMP '9999-12-31 00:00:00' (the ex-sentinel; the widest
  ts window in the corpus is 10 minutes, so window ends stay in-range);
  hash%23==1 users shift so min(ts) == '1970-01-01 00:00:00' (epoch);
  hash%23==2 users get ~40% per-row NULL ts (mixed untimed tail INSIDE an
  epoch-pinned neighborhood). ts is cast to micros (TIMESTAMP) — year
  9999 does not fit TIMESTAMP_NS, and both engines read micros
  identically.
- DATE columns: per-row branches to '1970-01-01' and '2262-04-11'
  (pre-epoch-adjacent and far-future WITH headroom: oracle date+INTERVAL
  arithmetic must not overflow either engine's calendar).
- DECIMAL(p,s) columns: exact max (10^(p-s) - 10^-s), exact min, 0.
- Non-key BIGINT/INTEGER: 0 and -1 (sign paths without SUM overflow —
  Spark ANSI SUM(bigint) errors where DuckDB promotes to HUGEINT, so
  int64-max is out of contract).
- VARCHAR: empty string, astral-plane unicode, and a separator-soup
  string ('a|b\\nc,d') that stresses '|'-joined canonicalizations.
- DOUBLE columns: left untouched (distributed SUM order makes extreme
  magnitudes non-comparable bit-exactly BY DESIGN; the exact-decimal
  aggregate contract covers realistic ranges).
- documents.text/n_chars: transformed together (n_chars = LENGTH(text)
  invariant preserved).
- Keys (PK/FK) never touched: every join still resolves.

Pure DuckDB transform of the read-only source; rerun-identical.
Output: /root/repo/.scale/composed/edgevals/*.parquet (gitignored) by
default; pass a second arg for a different destination (e.g. an
sf0.01-scale edge fixture).
Usage: python tools/make_edgevals.py [src_dir] [dst_dir]
"""

from __future__ import annotations

import os
import re
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        "composed",
        "edgevals",
    )
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

KEYS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey", "n_regionkey"),
    "customer": ("c_custkey", "c_nationkey"),
    "supplier": ("s_suppkey", "s_nationkey"),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

# The literal '\N' string is the CSV contract's nullValue token
# (sinks/writers.py CSV_NULL_TOKEN): a genuine '\N' value is written
# unescaped and would read back as NULL — the one residual conflation the
# r9 contract left. Keeping it in the corpus means any CSV round-trip
# query would catch it the day it matters (r10, ADVICE).
EDGE_STRINGS = ("''", "'\U0001F600\U0001D518 unicode'", "'a|b\nc,d'", "'\\N'")


def _edge_expr(pk: str, name: str, typ: str, i: int) -> str:
    """Per-row deterministic edge branch for one non-key column."""
    t = typ.upper()
    sel = f"hash({pk} * 41 + {i}) % 37"
    m = re.match(r"DECIMAL\((\d+),(\d+)\)", t)
    if m:
        p, s = int(m.group(1)), int(m.group(2))
        digits = "9" * (p - s) + "." + "9" * s if s else "9" * p
        branches = [f"CAST({digits} AS {typ})", f"CAST(-{digits} AS {typ})",
                    f"CAST(0 AS {typ})"]
    elif t == "DATE":
        branches = ["DATE '1970-01-01'", "DATE '2262-04-11'"]
    elif t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT"):
        branches = [f"CAST(0 AS {typ})", f"CAST(-1 AS {typ})"]
    elif t == "VARCHAR":
        branches = list(EDGE_STRINGS)
    else:  # DOUBLE, FLOAT, arrays, booleans, timestamps outside events.ts
        branches = []
    whens = "".join(
        f" WHEN {sel} = {b} THEN {expr}" for b, expr in enumerate(branches)
    )
    null_branch = f" WHEN {sel} = {len(branches)} THEN CAST(NULL AS {typ})"
    if not whens and not null_branch:
        return name
    return f"CASE{whens}{null_branch} ELSE {name} END AS {name}"


def main() -> None:
    con = duckdb.connect()
    os.makedirs(DST, exist_ok=True)
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        cols = con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        pk = KEYS[t][0]
        parts: list[str] = []
        for i, (name, typ, *_) in enumerate(cols):
            if name in KEYS[t]:
                parts.append(name)
            elif t == "documents" and name == "text":
                # text edges like any varchar; n_chars recomputed below
                parts.append(_edge_expr(pk, name, typ, 7).replace(" END AS text", " END AS text"))
            elif t == "documents" and name == "n_chars":
                parts.append(name)  # placeholder, fixed in outer select
            elif t == "events" and name == "ts":
                parts.append("ts")  # handled by the per-user epoch pass
            else:
                parts.append(_edge_expr(pk, name, typ, i))
        sql = f"SELECT {', '.join(parts)} FROM '{src}'"
        if t == "documents":
            # recompute n_chars from the (possibly edged) text, keeping the
            # NULL-together invariant
            sql = (
                f"SELECT * REPLACE (CASE WHEN text IS NULL THEN NULL "
                f"ELSE LENGTH(text) END AS n_chars) FROM ({sql})"
            )
        if t == "events":
            # per-user epoch pinning over micros ts; NULL pass per-row for
            # the %23==2 cohort
            sql = f"""
            SELECT * REPLACE (
              CASE
                WHEN hash(user_id) % 23 = 0 THEN
                  CAST(ts AS TIMESTAMP)
                    + (TIMESTAMP '9999-12-31 00:00:00'
                       - MAX(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id))
                WHEN hash(user_id) % 23 = 1 THEN
                  CAST(ts AS TIMESTAMP)
                    + (TIMESTAMP '1970-01-01 00:00:00'
                       - MIN(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id))
                WHEN hash(user_id) % 23 = 2 AND hash(event_id * 17) % 10 < 4 THEN
                  CAST(NULL AS TIMESTAMP)
                ELSE CAST(ts AS TIMESTAMP)
              END AS ts) FROM ({sql})
            """
        out = os.path.join(DST, f"{t}.parquet")
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"edgevals/{t}: {n} rows")

    # invariants: the sentinel-era pin actually landed, spans never grew,
    # and the documents text/n_chars contract held
    mx = con.execute(
        f"SELECT MAX(ts), MIN(ts) FROM '{DST}/events.parquet'"
    ).fetchone()
    assert str(mx[0]) == "9999-12-31 00:00:00", mx
    assert str(mx[1]) == "1970-01-01 00:00:00", mx
    span = con.execute(
        f"""
        WITH s AS (SELECT user_id, date_diff('day', MIN(ts), MAX(ts)) AS d
                   FROM '{DST}/events.parquet' GROUP BY user_id)
        SELECT MAX(d) FROM s
        """
    ).fetchone()[0]
    src_span = con.execute(
        f"""
        WITH s AS (SELECT user_id, date_diff('day', MIN(CAST(ts AS TIMESTAMP)),
                   MAX(CAST(ts AS TIMESTAMP))) AS d
                   FROM '{SRC}/events.parquet' GROUP BY user_id)
        SELECT MAX(d) FROM s
        """
    ).fetchone()[0]
    # +1: pinning max(ts) to midnight can cross one extra calendar-day
    # boundary; the physical span (max-min) never grows under a shift
    assert span <= src_span + 1, (span, src_span)
    bad = con.execute(
        f"SELECT COUNT(*) FROM '{DST}/documents.parquet' "
        "WHERE (text IS NULL) != (n_chars IS NULL) "
        "   OR (text IS NOT NULL AND n_chars != LENGTH(text))"
    ).fetchone()[0]
    assert bad == 0, f"documents text/n_chars invariant broken on {bad} rows"
    nulls = con.execute(
        f"SELECT COUNT(*) FILTER (ts IS NULL), COUNT(*) FROM '{DST}/events.parquet'"
    ).fetchone()
    print(f"edgevals events: {nulls[0]}/{nulls[1]} NULL ts; "
          f"max per-user span {span} days (src {src_span})")
    assert 0 < nulls[0] < nulls[1]


if __name__ == "__main__":
    main()
