"""Degenerate-input fixtures: empty / single-row / all-NULL variants.

The oracle corpus (tools/selfcheck.py) has only ever run on well-
populated fixtures; this generates the three classic degenerate shapes
from the smallest driver dataset so every registered query can be
value-checked against DuckDB on them (the empty-SUM NULL-vs-0 bug class
already bit once, in fk_integrity_audit — see
operators/warehouse.py:191-197):

- ``empty``:   every table with its full schema and 0 rows.
- ``single``:  exactly one row per table (ORDER BY primary key LIMIT 1;
               FK edges usually dangle — that is the point: joins,
               windows and group-bys over near-empty inputs).
- ``allnull``: up to 100 rows per table with every NON-KEY column NULL
               (keys — PKs and FKs — stay populated so joins still
               match and the NULL stress lands on measures, strings,
               dates, arrays).

Pure DuckDB transforms of the read-only source; rerun-identical.
Output: /root/repo/.scale/degenerate/{empty,single,allnull}/*.parquet
(gitignored). Usage: python tools/make_degenerate.py [src_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale",
    "degenerate",
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# key columns (PK + FK) that stay non-NULL in the allnull variant
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


def main() -> None:
    con = duckdb.connect()
    for variant in ("empty", "single", "allnull"):
        os.makedirs(os.path.join(DST, variant), exist_ok=True)
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        cols = con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        pk = KEYS[t][0]
        null_proj = ", ".join(
            name if name in KEYS[t] else f"CAST(NULL AS {typ}) AS {name}"
            for name, typ, *_ in cols
        )
        for variant, sql in (
            ("empty", f"SELECT * FROM '{src}' LIMIT 0"),
            ("single", f"SELECT * FROM '{src}' ORDER BY {pk} LIMIT 1"),
            (
                "allnull",
                f"SELECT {null_proj} FROM '{src}' ORDER BY {pk} LIMIT 100",
            ),
        ):
            out = os.path.join(DST, variant, f"{t}.parquet")
            con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
            n = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
            print(f"{variant}/{t}: {n} rows")


if __name__ == "__main__":
    main()
