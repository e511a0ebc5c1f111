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
        "mem": "30GB",  # the DISTINCT candidate arena dominates
    },
    # blocked self-join over part; output key_a == a.p_partkey.
    # COUNT streams (no DISTINCT), so the arena is the part×part hash
    # join build side — small; the cost is the levenshtein DP stream.
    "link_blocked_pairs": {
        "marker": "ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey",
        "expr": "a.p_partkey",
        "mem": "12GB",
    },
}


def _flag(name: str) -> str | None:
    return sys.argv[sys.argv.index(name) + 1] if name in sys.argv else None


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

    if "--shard" in sys.argv:
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
            ],
            capture_output=True,
            text=True,
        )

    total, ok = 0, 0
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
            ms = re.findall(rf"^SHARD {k} COUNT (\d+)$", r.stdout, re.M)
            if r.returncode == 0 and len(ms) == 1:
                total += int(ms[0])
                ok += 1
    print(
        f"oracle shard-count sum over {ok}/{len(shards)} attempted "
        f"shards: {total}"
    )
    rc = 0 if ok == len(shards) else 1
    if expect is not None and len(shards) == n and not rc:
        if total == int(expect):
            print(f"ok   {name}: shard-count sum == expected {expect}")
        else:
            print(
                f"FAIL {name}: shard-count sum {total} != expected {expect}"
            )
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
