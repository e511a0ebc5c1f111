"""Rows-only sharded oracle cross-check for the pair-generator queries
whose DuckDB oracle is too expensive to full-value-digest at sf10 in one
round (r11: dedup_ppjoin; r12: link_blocked_pairs).

Runs the CHEAP half of the shard lane only: the per-shard oracle with
the shard predicate injected into its candidate join's ON clause (the
SAME marker + predicate builder as the full-value ``shard_check.py
--inject-marker`` lane — factored into ``shard_check.shard_predicate``/
``build_injected_oracle`` in r12 per ADVICE so the two lanes cannot
drift) under COUNT(*) — no row streaming, no Spark session — and
requires the N shard counts to sum exactly to the engine's committed
rowcount (``--expect``). This is a rows-only check (cardinality per
shard-sum, not values); the value evidence for these names remains
sf1 full-value plus their losslessness pytests.

Shards are PROCESS-ISOLATED (one subprocess each): a failed DuckDB
arena is not released by close(), so an OOM in one in-process shard
poisons every later one (the documented selfcheck/shard_check failure
mode). Shard success is gated on BOTH the child's exit code and its
machine-readable ``SHARD <k> COUNT <n>`` line (r12, ADVICE — the r11
tool regexed a human line off stdout and would have counted a child
that printed it and then crashed).

Usage:
  python tools/count_shards.py NAME SF_DIR [N_SHARDS] [N_PARALLEL]
         [--only k1,k2,...] [--expect N] [--shard k]

Exit 0 iff every ATTEMPTED shard is green (r12, ADVICE — the r11 tool
compared ok against the full N, so a fully green --only retry wave
always exited 1) and, when --expect is given with the full shard set,
the counts sum exactly to it.
"""

from __future__ import annotations

import re
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor, as_completed

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from shard_check import build_injected_oracle  # noqa: E402

# Injection points per query: the unique ON-clause marker of the
# candidate-enumerating join and the a-side key expression whose
# pmod(n) == the output shard. The asserts in build_injected_oracle
# fail loudly if an oracle rewrite moves or duplicates the marker.
INJECTIONS: dict[str, dict[str, str]] = {
    # prefix self-join over documents; output id_a == a.doc_id
    "dedup_ppjoin": {
        "marker": "ON a.tok = b.tok AND a.doc_id < b.doc_id",
        "expr": "a.doc_id",
        "out_col": "id_a",
        "mem": "30GB",  # the DISTINCT candidate arena dominates
    },
    # blocked self-join over part; output key_a == a.p_partkey.
    # COUNT streams (no DISTINCT), so the arena is the part×part hash
    # join build side — small; the cost is the levenshtein DP stream.
    "link_blocked_pairs": {
        "marker": "ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey",
        "expr": "a.p_partkey",
        "out_col": "key_a",
        "mem": "12GB",
    },
}


def _flag(name: str) -> str | None:
    return sys.argv[sys.argv.index(name) + 1] if name in sys.argv else None


_DIGEST_OK = {
    # dtypes whose VARCHAR/string cast prints identically on both
    # engines (selfcheck's _DIGEST_OK_{DUCK,SPARK}, unioned) — doubles
    # do NOT qualify, so dedup_ppjoin (jaccard DOUBLE) must use the
    # RowDigest shard lane, never this one
    "bigint", "integer", "int", "smallint", "tinyint", "hugeint",
    "varchar", "string", "date",
}


def _digest_cols(otypes: dict[str, str]) -> tuple[list[str], list[str]]:
    """(order, int_cols) for the sql-digest, derived the same way on
    both sides: sorted column names; int SUM columns are everything but
    varchar/string and date. Fails loudly on any dtype whose textual
    cast is not engine-portable."""
    bad = {c: t for c, t in otypes.items() if t.lower() not in _DIGEST_OK}
    assert not bad, f"sql-digest unsupported dtypes: {bad}"
    order = sorted(otypes)
    int_cols = [
        c
        for c in order
        if otypes[c].lower() not in ("varchar", "string", "date")
    ]
    return order, int_cols


def shard_digest(name: str, sf_dir: str, k: int, n: int) -> dict:
    """Per-shard ORACLE sql-digest (r12): the injected shard oracle
    reduced to one aggregate row — COUNT(*), the order-insensitive
    60-bit row-hash SUM, per-int-column SUMs — via selfcheck's shared
    duck_digest_sql builder. No row streaming, so cost ≈ the COUNT lane
    plus one md5 per qualifying row; together with the engine's single
    grouped-digest job (parent mode) this upgrades a shard-sum check
    from cardinality-only to VALUE evidence (sql-digest class)."""
    import json as _json
    import os
    import tempfile

    import duckdb

    from selfcheck import duck_digest_sql

    from data_bridge_spark.catalog import TABLE_NAMES
    from data_bridge_spark.registry import load_all

    spec = INJECTIONS[name]
    q = load_all()[name]
    osql = build_injected_oracle(
        q.oracle, spec["marker"], spec["expr"], k, n
    )
    con = duckdb.connect()
    con.execute(
        f"SET memory_limit='{os.environ.get('SELFCHECK_DUCK_MEM', spec['mem'])}'"
    )
    con.execute(
        f"SET threads={int(os.environ.get('SELFCHECK_DUCK_THREADS', '8'))}"
    )
    sp = "/root/repo/.scale/ducktmp"
    os.makedirs(sp, exist_ok=True)
    con.execute(
        f"SET temp_directory='{tempfile.mkdtemp(prefix='dbs_dig_', dir=sp)}'"
    )
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    otypes = {
        r[0]: r[1].lower()
        for r in con.execute(f"DESCRIBE SELECT * FROM ({q.oracle})").fetchall()
    }
    order, int_cols = _digest_cols(otypes)
    t0 = time.time()
    cur = con.execute(duck_digest_sql(order, int_cols, osql))
    row = cur.fetchone()
    dig = {c[0]: int(v) for c, v in zip(cur.description, row)}
    print(
        f"ok   {name} oracle digest shard {k}/{n}: {dig['n']} rows "
        f"({time.time()-t0:.1f}s)",
        flush=True,
    )
    print(f"SHARD {k} DIGEST {_json.dumps(dig, sort_keys=True)}", flush=True)
    con.close()
    return dig


def engine_shard_digests(name: str, sf_dir: str, n: int) -> dict[int, dict]:
    """ONE engine execution, digested per shard: the full query grouped
    by the shard assignment of out_col (pmod, NULLs to shard 0 — the
    same total map as shard_predicate), aggregated with selfcheck's
    spark_digest_aggs. The whole 10.9B-row link_blocked_pairs output
    reduces map-side to n digest rows — no re-execution per shard, no
    row ever leaves the JVM."""
    from pyspark.sql import functions as F

    from selfcheck import spark_digest_aggs

    from data_bridge_spark.registry import load_all
    from data_bridge_spark.session import get_spark

    spec = INJECTIONS[name]
    spark = get_spark("count_shards_engine")
    sdf = load_all()[name].fn(spark, sf_dir)
    stypes = {c: t.lower() for c, t in sdf.dtypes}
    order, int_cols = _digest_cols(stypes)
    assign = (
        F.when(F.col(spec["out_col"]).isNull(), 0)
        .otherwise(F.pmod(F.col(spec["out_col"]), F.lit(n)))
        .cast("int")
        .alias("__shard")
    )
    t0 = time.time()
    rows = (
        sdf.groupBy(assign)
        .agg(*spark_digest_aggs(order, int_cols))
        .collect()
    )
    out = {
        r["__shard"]: {
            k2: int(v) for k2, v in r.asDict().items() if k2 != "__shard"
        }
        for r in rows
    }
    print(
        f"ok   {name}: engine digested once into {len(out)} shard rows "
        f"({time.time()-t0:.1f}s)",
        flush=True,
    )
    return out


def shard_count(name: str, sf_dir: str, k: int, n: int) -> int:
    import os
    import tempfile

    import duckdb

    from data_bridge_spark.catalog import TABLE_NAMES
    from data_bridge_spark.registry import load_all

    spec = INJECTIONS[name]
    q = load_all()[name]
    osql = build_injected_oracle(
        q.oracle, spec["marker"], spec["expr"], k, n
    )
    con = duckdb.connect()
    con.execute(
        f"SET memory_limit='{os.environ.get('SELFCHECK_DUCK_MEM', spec['mem'])}'"
    )
    con.execute(
        f"SET threads={int(os.environ.get('SELFCHECK_DUCK_THREADS', '8'))}"
    )
    sp = "/root/repo/.scale/ducktmp"
    os.makedirs(sp, exist_ok=True)
    con.execute(
        f"SET temp_directory='{tempfile.mkdtemp(prefix='dbs_cnt_', dir=sp)}'"
    )
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    t0 = time.time()
    cnt = con.execute(f"SELECT COUNT(*) FROM ({osql})").fetchone()[0]
    print(
        f"ok   {name} oracle shard {k}/{n}: {cnt} rows "
        f"({time.time()-t0:.1f}s)",
        flush=True,
    )
    # machine-readable line the parent gates on (one per green shard)
    print(f"SHARD {k} COUNT {cnt}", flush=True)
    con.close()
    return cnt


def main() -> int:
    # positionals parsed defensively: flag values never bleed into them
    # (r12, ADVICE — `--only` in position 3 crashed the r11 parser)
    flag_args = set()
    for f in ("--only", "--expect", "--shard"):
        if f in sys.argv:
            i = sys.argv.index(f)
            flag_args.update({i, i + 1})
    pos = [
        a
        for i, a in enumerate(sys.argv[1:], start=1)
        if i not in flag_args and not a.startswith("--")
    ]
    name, sf_dir = pos[0], pos[1]
    assert name in INJECTIONS, f"no injection spec for {name}"
    n = int(pos[2]) if len(pos) > 2 else 16
    par = int(pos[3]) if len(pos) > 3 else 3

    digest = "--digest" in sys.argv

    if "--shard" in sys.argv:
        if digest:
            shard_digest(name, sf_dir, int(_flag("--shard")), n)
        else:
            shard_count(name, sf_dir, int(_flag("--shard")), n)
        return 0

    shards = list(range(n))
    only = _flag("--only")
    if only is not None:  # rerun OOM'd shards, e.g. at a raised bound
        shards = [int(x) for x in only.split(",")]
    expect = _flag("--expect")

    def run_shard(k: int) -> tuple[int, subprocess.CompletedProcess]:
        return k, subprocess.run(
            [
                sys.executable,
                __file__,
                name,
                sf_dir,
                str(n),
                "--shard",
                str(k),
            ]
            + (["--digest"] if digest else []),
            capture_output=True,
            text=True,
        )

    # --digest: the engine's one grouped-digest execution runs in its
    # own thread CONCURRENTLY with the oracle shard subprocesses — the
    # two sides are independent until the final compare
    engine: dict[int, dict] = {}
    eng_thread = None
    if digest:
        import threading

        def _eng() -> None:
            engine.update(engine_shard_digests(name, sf_dir, n))

        eng_thread = threading.Thread(target=_eng)
        eng_thread.start()

    import json as _json

    total, ok = 0, 0
    oracle_digs: dict[int, dict] = {}
    # stream results as shards land (as_completed), so a killed parent
    # still leaves every finished shard's line in the log
    with ThreadPoolExecutor(max_workers=par) as pool:
        futs = [pool.submit(run_shard, k) for k in shards]
        for fut in as_completed(futs):
            k, r = fut.result()
            sys.stdout.write(r.stdout)
            if r.returncode:
                sys.stdout.write(
                    f"FAIL {name} shard {k}: rc={r.returncode}\n"
                    + r.stderr[-500:]
                )
            sys.stdout.flush()
            # success = exit 0 AND exactly one machine line (ADVICE)
            if digest:
                ms = re.findall(
                    rf"^SHARD {k} DIGEST (.+)$", r.stdout, re.M
                )
                if r.returncode == 0 and len(ms) == 1:
                    oracle_digs[k] = _json.loads(ms[0])
                    total += oracle_digs[k]["n"]
                    ok += 1
            else:
                ms = re.findall(rf"^SHARD {k} COUNT (\d+)$", r.stdout, re.M)
                if r.returncode == 0 and len(ms) == 1:
                    total += int(ms[0])
                    ok += 1
    kind = "digest" if digest else "count"
    print(
        f"oracle shard-{kind} sum over {ok}/{len(shards)} attempted "
        f"shards: {total}"
    )
    rc = 0 if ok == len(shards) else 1
    if digest:
        if eng_thread is not None:
            eng_thread.join()
        for k in sorted(oracle_digs):
            odig = oracle_digs[k]
            edig = engine.get(
                k, {key: 0 for key in odig}  # empty shard: all-zero digest
            )
            if edig == odig:
                print(
                    f"ok   {name} shard {k}/{n}: {odig['n']} rows match "
                    f"(sql-digest)"
                )
            else:
                print(
                    f"FAIL {name} shard {k}/{n}: engine={edig} oracle={odig}"
                )
                rc = 1
        # coverage: engine shards the oracle lane never attempted (or
        # that failed) must not hide rows
        stray = sorted(
            k for k in engine if k not in oracle_digs and engine[k]["n"] > 0
        )
        if len(shards) == n and stray:
            print(f"FAIL {name}: engine rows in unverified shards {stray}")
            rc = 1
    if expect is not None and len(shards) == n and not rc:
        if total == int(expect):
            print(f"ok   {name}: shard-{kind} sum == expected {expect}")
        else:
            print(
                f"FAIL {name}: shard-{kind} sum {total} != expected {expect}"
            )
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
