"""Composed adversarial fixtures (round-8): interactions between the
round-7 axes, which tested independently — the GREATEST/LEAST NULL
blindness bug was only caught by re-running one fixture after the other's
fix, so axis interactions are a live bug source.

- ``mixednull``: every NON-KEY column NULL on a deterministic ~30% of
  rows (hash of the PK and the column's ordinal — columns null out on
  DIFFERENT row subsets, so no column pair is NULL-correlated except
  documents.text/n_chars, which stay consistent with the
  n_chars = LENGTH(text) invariant). This is the regime the r7 fixtures
  skipped entirely: all-NULL and no-NULL both dodge the Spark-NULLS-FIRST
  vs DuckDB-NULLS-LAST window divergence that only MIXED columns hit
  (the feature_quantile_bucket advice finding).
- ``skewnull``: the fuzz fixture's hot-key remap (supplier 0 owns ~30%
  of lineitem, user 0 owns ~30% of events) COMPOSED with the allnull
  fixture's non-key NULLing — skew-splitting joins and salted aggs whose
  measures are all NULL.
- ``emptydim``: dimension tables (region nation customer supplier part)
  0-row with full schema; fact tables populated — every dim join runs
  with an empty build side (broadcast of nothing, outer-join NULL fill,
  anti-join keep-everything).
- ``emptyfact``: the reverse — populated dims, 0-row facts (orders
  lineitem events documents embeddings): every aggregate over an empty
  probe side, empty-input grand totals.

Pure DuckDB transforms of the read-only source; rerun-identical.
Output: /root/repo/.scale/composed/{mixednull,skewnull,emptydim,emptyfact}/
*.parquet (gitignored). Usage: python tools/make_composed.py [src_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale",
    "composed",
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
DIMS = ("region", "nation", "customer", "supplier", "part")
FACTS = ("orders", "lineitem", "events", "documents", "embeddings")

# key columns (PK + FK) that always stay non-NULL
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

# fuzz-style deterministic hot-key remaps (keys stay FK-valid)
SKEW_KEY: dict[str, dict[str, str]] = {
    "lineitem": {
        "l_suppkey": "CASE WHEN hash(l_orderkey * 7 + l_linenumber) % 10 < 3"
        " THEN 0 ELSE l_suppkey END"
    },
    "events": {
        "user_id": "CASE WHEN hash(event_id * 13) % 10 < 3 THEN 0 ELSE user_id END"
    },
}


def _null_expr(table: str, pk: str, name: str, typ: str, i: int, mixed: bool) -> str:
    """NULL a non-key column — on ~30% of rows (mixed) or all rows."""
    if not mixed:
        return f"CAST(NULL AS {typ}) AS {name}"
    # text/n_chars must null TOGETHER to keep n_chars = LENGTH(text)
    salt = 2 if (table == "documents" and name in ("text", "n_chars")) else i
    return (
        f"CASE WHEN hash({pk} * 31 + {salt}) % 10 < 3 "
        f"THEN CAST(NULL AS {typ}) ELSE {name} END AS {name}"
    )


def main() -> None:
    con = duckdb.connect()
    for variant in ("mixednull", "skewnull", "emptydim", "emptyfact"):
        os.makedirs(os.path.join(DST, variant), exist_ok=True)
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        cols = con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        pk = KEYS[t][0]
        skew = SKEW_KEY.get(t, {})

        def proj(mixed: bool) -> str:
            parts = []
            for i, (name, typ, *_) in enumerate(cols):
                if name in KEYS[t]:
                    parts.append(f"{skew[name]} AS {name}" if name in skew else name)
                else:
                    parts.append(_null_expr(t, pk, name, typ, i, mixed))
            return ", ".join(parts)

        variants = {
            "mixednull": f"SELECT {proj(True)} FROM '{src}'",
            "skewnull": f"SELECT {proj(False)} FROM '{src}'",
            "emptydim": f"SELECT * FROM '{src}' LIMIT {0 if t in DIMS else 10**12}",
            "emptyfact": f"SELECT * FROM '{src}' LIMIT {0 if t in FACTS else 10**12}",
        }
        for variant, sql in variants.items():
            out = os.path.join(DST, variant, f"{t}.parquet")
            con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
            n = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
            print(f"{variant}/{t}: {n} rows")
    # invariant checks
    bad = con.execute(
        f"SELECT COUNT(*) FROM '{DST}/mixednull/documents.parquet' "
        "WHERE (text IS NULL) != (n_chars IS NULL) "
        "   OR (text IS NOT NULL AND n_chars != LENGTH(text))"
    ).fetchone()[0]
    assert bad == 0, f"documents text/n_chars invariant broken on {bad} rows"
    mix = con.execute(
        f"SELECT COUNT(*) FILTER (o_totalprice IS NULL), COUNT(*) "
        f"FROM '{DST}/mixednull/orders.parquet'"
    ).fetchone()
    print(f"mixednull orders: {mix[0]}/{mix[1]} NULL o_totalprice")
    assert 0 < mix[0] < mix[1], "mixednull must mix NULL and non-NULL"


if __name__ == "__main__":
    main()
