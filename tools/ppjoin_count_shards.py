"""Rows-only sf10 cross-check for dedup_ppjoin's oracle (r11).

The full-value digest lane exists (shard_check --inject-marker, proven
green at sf0.01) but one sf10 shard costs ~880 s of oracle compute plus
~10 min of row streaming at a ~35 GB peak, so 16 shards do not fit a
round's tail. This tool runs the CHEAP half only: the injected
per-shard oracle under COUNT(*) — no row streaming, no Spark session —
and requires the 16 counts to sum to the ENGINE's committed sf10
rowcount (709,880,900, docs/ENGINE_sf10_r11_ppjoin.log). That is a
rows-only check (cardinality per shard-sum, not values); the value
evidence remains sf1 full-value plus the sf0.01 all-pairs losslessness
pytest. Injection point and predicate are identical to the
shard_check --inject-marker lane, so a later round can upgrade this to
full-value digests with the same sharding.

Shards are PROCESS-ISOLATED (one subprocess each): the first version
ran 3 concurrent connections in one process and a single shard's OOM
poisoned the shared allocator for all of them — the exact failure mode
selfcheck/shard_check already document (a failed DuckDB arena is not
released by close()).

Usage: python tools/ppjoin_count_shards.py SF_DIR N_SHARDS N_PARALLEL
"""

from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor

MARKER = "ON a.tok = b.tok AND a.doc_id < b.doc_id"


def shard_count(sf_dir: str, k: int, n: int) -> int:
    import os
    import tempfile

    import duckdb

    sys.path.insert(0, "/root/repo")
    from data_bridge_spark.registry import load_all

    q = load_all()["dedup_ppjoin"]
    assert q.oracle.count(MARKER) == 1
    e = "(a.doc_id)"
    inj = (
        f"((({e}) IS NULL AND {k} = 0) OR "
        f"(({e} % {n}) + {n}) % {n} = {k})"
    )
    osql = q.oracle.replace(MARKER, f"{MARKER} AND {inj}")
    con = duckdb.connect()
    con.execute(
        f"SET memory_limit='{os.environ.get('SELFCHECK_DUCK_MEM', '30GB')}'"
    )
    con.execute(
        f"SET threads={int(os.environ.get('SELFCHECK_DUCK_THREADS', '8'))}"
    )
    sp = "/root/repo/.scale/ducktmp"
    os.makedirs(sp, exist_ok=True)
    con.execute(
        f"SET temp_directory='{tempfile.mkdtemp(prefix='dbs_ppc_', dir=sp)}'"
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    t0 = time.time()
    cnt = con.execute(f"SELECT COUNT(*) FROM ({osql})").fetchone()[0]
    print(
        f"ok   dedup_ppjoin oracle shard {k}/{n}: {cnt} rows "
        f"({time.time()-t0:.1f}s)",
        flush=True,
    )
    con.close()
    return cnt


def main() -> int:
    if "--shard" in sys.argv:
        k = int(sys.argv[sys.argv.index("--shard") + 1])
        shard_count(sys.argv[1], k, int(sys.argv[2]))
        return 0
    sf_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    par = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    shards = list(range(n))
    if "--only" in sys.argv:  # rerun OOM'd shards at a raised bound
        shards = [
            int(x) for x in sys.argv[sys.argv.index("--only") + 1].split(",")
        ]

    import re
    import subprocess

    def run_shard(k: int) -> subprocess.CompletedProcess:
        return subprocess.run(
            [sys.executable, __file__, sf_dir, str(n), "--shard", str(k)],
            capture_output=True,
            text=True,
        )

    total, ok = 0, 0
    # stream results as shards land (as_completed), so a killed parent
    # still leaves every finished shard's line in the log
    from concurrent.futures import as_completed

    with ThreadPoolExecutor(max_workers=par) as pool:
        futs = {pool.submit(run_shard, k): k for k in shards}
        for fut in as_completed(futs):
            r = fut.result()
            sys.stdout.write(r.stdout)
            if r.returncode:
                sys.stdout.write(r.stderr[-500:])
            sys.stdout.flush()
            m = re.search(r"ok .*: (\d+) rows", r.stdout)
            if m:
                total += int(m.group(1))
                ok += 1
    print(f"oracle shard-count sum over {ok}/{len(shards)} attempted shards: {total}")
    return 0 if ok == n else 1


if __name__ == "__main__":
    raise SystemExit(main())
