"""Deterministic sf1.0 synthesis: 10 key-shifted shards of sf0.1.

The driver ships sf{0.001,0.01,0.1}; the 100 TB arguments in SCALE.md are
plan-shape arguments, so this adds the measured decade (r5 verdict item
4): sf1 = shard 0 (byte-identical sf0.1) plus shards 1..9 with every key
column shifted by a per-table offset — FK edges shift consistently, so
join/agg selectivities and per-key cardinalities are preserved while key
counts scale 10x (wider, not deeper — the shape a real corpus grows in).

Content columns are made shard-unique where identity would distort the
measured operator (documents.text gets a per-shard word suffix so the
dedup/minhash family sees 10 independent sub-corpora with the same
intra-shard near-dup structure, not a 90%-exact-dup corpus; n_chars is
recomputed to keep its LENGTH(text) invariant).  region/nation stay
fixed (TPC-H dims that do not scale with SF).

Embeddings (r11): each shard's vectors go through a per-shard SIGNED
PERMUTATION of the 64 dimensions — an orthogonal transform, so every
intra-shard pairwise cosine (and norm) is preserved exactly up to float
summation order, while cross-shard vectors are decorrelated instead of
byte-identical.  The r10 fixture replicated embeddings verbatim, which
made dedup_embed_lsh's sf10 output a shard-squared exact-replica
artifact (~47.7M pairs); with the transform, cross-shard same-bucket
pairs have generic-direction cosines and the corpus scales the way a
real one grows (new content, same intra-corpus near-dup structure).
The permutation/sign choices come from a fixed LCG seeded by the shard
index — deterministic, rerun-identical, no RNG state.  Shard 0 stays
the identity (byte-identical sf0.1).  The ANN query set is vec_id <
150, i.e. shard 0, and the search corpus grows 10x, which is the
scaling being measured.

Pure DuckDB relational transforms of the read-only source — seed-free,
rerun-identical. Output: /root/repo/.scale/sf1/*.parquet (gitignored).

The same construction extends to any decade: shard key ranges stay
disjoint for any shard count (every key maximum is < its offset), so
`make_sf1.py 100 .scale/sf10` yields sf10 — the second measured decade.

Usage: python tools/make_sf1.py [n_shards] [dst_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1")

# per-table key offsets — each > 10x the sf0.1 key maximum, so shard key
# ranges are disjoint and keys stay readable (shard = key // offset)
C_OFF = 1_000_000  # c_custkey max 15_000 at sf0.1
S_OFF = 100_000  # s_suppkey max 1_000
P_OFF = 1_000_000  # p_partkey max 20_000
O_OFF = 10_000_000  # o_orderkey max 149_999
E_OFF = 1_000_000  # event_id max 99_999
U_OFF = 10_000  # user_id max 1_499
D_OFF = 100_000  # doc_id
V_OFF = 100_000  # vec_id


_EMBED_DIM = 64


def _signed_perm(i: int) -> tuple[list[int], list[int]]:
    """Deterministic signed permutation for shard i: Fisher-Yates driven
    by a fixed LCG (Numerical Recipes constants), seed = shard index.
    Shard 0 is the identity so sf0.1 remains byte-identical there."""
    if i == 0:
        return list(range(1, _EMBED_DIM + 1)), [1] * _EMBED_DIM
    state = (i * 2654435761) & 0xFFFFFFFF

    def nxt() -> int:
        nonlocal state
        state = (1664525 * state + 1013904223) & 0xFFFFFFFF
        return state

    perm = list(range(1, _EMBED_DIM + 1))
    for j in range(_EMBED_DIM - 1, 0, -1):
        k = nxt() % (j + 1)
        perm[j], perm[k] = perm[k], perm[j]
    signs = [1 if nxt() & 1 else -1 for _ in range(_EMBED_DIM)]
    return perm, signs


def _embed_expr(i: int) -> str:
    """SQL list literal applying shard i's signed permutation — element
    negation is exact in float, so the transform is orthogonal in
    exact arithmetic and lossless on the stored float32 values."""
    perm, signs = _signed_perm(i)
    parts = [
        f"-embedding[{p}]" if s < 0 else f"embedding[{p}]"
        for p, s in zip(perm, signs)
    ]
    return f"CAST([{', '.join(parts)}] AS FLOAT[])"


def shard_sql(i: int) -> dict[str, str]:
    """SELECT text producing shard i of each scaled table."""
    suffix = (
        "text"
        if i == 0
        else f"regexp_replace(text, '(\\S+)', '\\1_{i}', 'g')"
    )
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
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM src""",
        "lineitem": f"""
            SELECT l_orderkey + {i * O_OFF} AS l_orderkey,
                   l_partkey + {i * P_OFF} AS l_partkey,
                   l_suppkey + {i * S_OFF} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                   l_returnflag, l_linestatus, l_shipdate
            FROM src""",
        "events": f"""
            SELECT event_id + {i * E_OFF} AS event_id, ts,
                   user_id + {i * U_OFF} AS user_id, event_type, value, props
            FROM src""",
        "documents": f"""
            SELECT doc_id + {i * D_OFF} AS doc_id, {suffix} AS text, lang, source,
                   CAST(LENGTH({suffix}) AS BIGINT) AS n_chars
            FROM src""",
        "embeddings": f"""
            SELECT vec_id + {i * V_OFF} AS vec_id,
                   {_embed_expr(i)} AS embedding, label
            FROM src""",
    }


def main() -> None:
    # --tables t1,t2: regenerate only the named tables into DST (for
    # refreshing one table of an existing corpus, e.g. the r11
    # embeddings perturbation into the already-built sf10)
    only_tables: set[str] | None = None
    if "--tables" in sys.argv:
        j = sys.argv.index("--tables")
        only_tables = set(sys.argv[j + 1].split(","))
        del sys.argv[j : j + 2]
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    global DST
    if len(sys.argv) > 2:
        DST = os.path.abspath(sys.argv[2])
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # fixed dims: copy through unchanged
    for t in ("region", "nation"):
        if only_tables is not None and t not in only_tables:
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")
    scaled = shard_sql(0).keys()
    for t in scaled:
        if only_tables is not None and t not in only_tables:
            continue
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')")
        union = "\nUNION ALL\n".join(shard_sql(i)[t] for i in range(n_shards))
        con.execute(f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
