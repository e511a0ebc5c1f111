"""Sharded full-value compare: the standard strict RowDigest lane, run
per key-shard on BOTH engines.

Exists for queries whose DuckDB oracle cannot fold the full keyspace in
one process at big SF — ts_holt_winters at sf10 OOMs every memory bound
tried (32/80/90GB, threads 32 and 4): the per-user 9-slot list_reduce
intermediates are not spillable, and unlike the multi-hour-but-finite
ppjoin oracles the failure is hard. The ENGINE side is fine (sf1
full-value green within 32GB); the ORACLE needs the keyspace split.

Mechanics: both engines are filtered by the same total predicate on the
shard column — ``(col IS NULL AND shard = 0) OR ((col % n) + n) % n =
shard`` — so the n shard outputs partition the full result exactly
(every output row lands in exactly one shard; NULL keys land in shard 0;
the double-mod pmod form keeps negative keys covered, since Spark and
DuckDB ``%`` both take the dividend's sign and a bare ``col % n = k``
would match no k in 0..n-1 for negative keys — (r11, ADVICE)). Each
shard is compared with selfcheck's strict canonical-multiset lane (same
canon(), same RowDigest), and n green shards therefore equal one green
full-value check at the SF — the parent additionally asserts that the
per-shard engine rowcounts sum to the full unfiltered count, so any
partition gap fails loudly instead of reporting green. Filter pushdown
through the oracle's GROUP BY on the shard column is what bounds the
fold memory to ~1/n.

Usage: python tools/shard_check.py SF_DIR NAME SHARD_COL N_SHARDS
         [--only k1,k2,...] [--push-table TABLE]

--only runs a subset of the n shards (for re-running oracle-OOM'd shards
at a finer grain, e.g. N_SHARDS=64 --only 10,26,42,58); the coverage-sum
assertion is skipped for subsets since they don't partition the output.

--push-expr EXPR (with --push-table) shards the base view on EXPR — a
SQL expression over the base table's columns — instead of the output
shard column's name. Needed when the shard column is DERIVED inside the
oracle (pack_sequences' pack_group is an md5 hash of doc_id, computable
on the documents view but not present there as a column). The Spark
side still filters the OUTPUT column, so the asserted equivalence
"EXPR on base rows == shard column on output rows" is itself verified
by the digests.

--push-table TABLE pushes the shard predicate into TABLE's view on the
ORACLE side instead of wrapping the oracle's output (r11). Needed when
the oracle contains a pushdown barrier — ts_anomaly_resid's
unnest(generate_series(...)) lateral blocks DuckDB's filter pushdown
entirely, so the output-wrapping form folds the FULL keyspace for every
shard (EXPLAIN shows the filter above the final join, both parquet
scans unfiltered) and the fold arena OOMs shard-independently at sf10.
Pushing into the view is valid iff the query is per-key decomposable on
the shard column (each output row derives only from base rows with the
same key) — which is this tool's premise — and the assumption is
SELF-VERIFYING: the Spark side still filters the full OUTPUT, so if
decomposability did not hold, the per-shard digests would diverge and
the shard FAILs loudly rather than passing on a wrong subset.

--spark-mat DIR (r12) materializes the ENGINE output ONCE — the parent
runs the full query and writes it to DIR partitioned by the shard
assignment — and each shard child digests its partition of that
parquet instead of re-executing the query. Without it, N shards pay N
full engine executions (dedup_ppjoin at sf10: 16 x ~23 min of join
compute just to re-derive the same 709.9M rows — the r12 first attempt
extrapolated to ~8 h of wall). Evidence class is unchanged: selfcheck
and the default shard path ALREADY digest a scratch-parquet
materialization of the engine output (see the materialize-then-stream
comment below), this just hoists the write above the shard loop. Every
output row is still digested exactly once against the independently
sharded oracle; a mis-partitioned write cannot pass silently because a
row in the wrong partition fails BOTH its own shard's digest and the
parent's coverage-sum (children filter by partition AND by the exact
predicate, so a misplaced row vanishes from every shard and the sum
comes up short).
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from selfcheck import RowDigest, canon_duck_type, canon_spark_type  # noqa: E402

from data_bridge_spark.catalog import TABLE_NAMES  # noqa: E402
from data_bridge_spark.registry import load_all  # noqa: E402
from data_bridge_spark.session import get_spark  # noqa: E402


def shard_predicate(expr: str, k: int, n: int) -> str:
    """The canonical sign-safe total shard predicate on EXPR: NULLs land
    in shard 0, the double-mod pmod form covers negative keys. Single
    source of truth for every shard lane (this tool's output wrap, push
    and inject paths, and tools/count_shards.py — factored in r12 per
    ADVICE so the full-value and rows-only lanes cannot drift)."""
    e = f"({expr})"
    return (
        f"((({e}) IS NULL AND {k} = 0) OR "
        f"(({e} % {n}) + {n}) % {n} = {k})"
    )


def build_injected_oracle(
    oracle_sql: str, marker: str, expr: str, k: int, n: int
) -> str:
    """Insert the shard predicate on EXPR directly after MARKER (which
    must occur exactly once — asserted, so an oracle rewrite that drops
    or duplicates the ON clause fails loudly in every lane at once)."""
    n_hits = oracle_sql.count(marker)
    assert n_hits == 1, (
        f"--inject-marker must match exactly once, found {n_hits}"
    )
    return oracle_sql.replace(
        marker, f"{marker} AND {shard_predicate(expr, k, n)}"
    )


def main() -> int:
    # Parent mode (no --shard): one subprocess per shard. A heavy oracle
    # can leave the in-process DuckDB arena unreleasable even after it
    # SUCCEEDS (the same poison selfcheck re-execs around), so shard
    # isolation must be process isolation — the first in-process version
    # of this tool passed shard 0 and then OOM'd shard 1 on a 307-byte
    # allocation.
    if "--shard" not in sys.argv:
        import re
        import subprocess
        from concurrent.futures import ThreadPoolExecutor

        n_shards = int(sys.argv[4])
        shards = list(range(n_shards))
        if "--only" in sys.argv:
            shards = [
                int(x)
                for x in sys.argv[sys.argv.index("--only") + 1].split(",")
            ]
        # --parallel N: run N shard subprocesses concurrently. For
        # iteration-bound oracles (pack_sequences' recursive CTE), each
        # shard is a long mostly-serial recursion with a SMALL arena —
        # the opposite profile of the fold-OOM oracles — so wall time
        # divides by N while memory stays bounded. Keep 1 (default)
        # for fold-heavy oracles where concurrent arenas would race the
        # memory bound.
        n_par = (
            int(sys.argv[sys.argv.index("--parallel") + 1])
            if "--parallel" in sys.argv
            else 1
        )
        rc = 0
        shard_rows = 0
        push = (
            ["--push-table", sys.argv[sys.argv.index("--push-table") + 1]]
            if "--push-table" in sys.argv
            else []
        )
        if "--push-expr" in sys.argv:
            push += [
                "--push-expr",
                sys.argv[sys.argv.index("--push-expr") + 1],
            ]
        if "--inject-marker" in sys.argv:
            push += [
                "--inject-marker",
                sys.argv[sys.argv.index("--inject-marker") + 1],
            ]
        spark_mat = (
            sys.argv[sys.argv.index("--spark-mat") + 1]
            if "--spark-mat" in sys.argv
            else None
        )
        if spark_mat is not None:
            import os as _os

            push += ["--spark-mat", spark_mat]
            if not _os.path.isdir(spark_mat):
                # one full engine execution, written partitioned by the
                # shard assignment (pmod, NULLs to shard 0 — the same
                # total map as shard_predicate)
                from pyspark.sql import functions as F

                registry = load_all()
                spark = get_spark("shard_check_mat")
                sdf = registry[sys.argv[2]].fn(spark, sys.argv[1])
                scol = sys.argv[3]
                assign = (
                    F.when(F.col(scol).isNull(), 0)
                    .otherwise(F.pmod(F.col(scol), F.lit(n_shards)))
                    .cast("int")
                )
                t_mat = time.time()
                # repartition on __shard BEFORE the partitioned write:
                # without it every task holds one open parquet writer
                # (and its row-group buffer) per shard directory — 16
                # writers x 32 tasks exhausted task memory at sf10
                # (GCLocker retries -> page-allocation failures). Keyed
                # on __shard alone, each task owns exactly one directory
                # and one writer; 4x n partitions keeps hash collisions
                # from serializing several shards into one task.
                (
                    sdf.withColumn("__shard", assign)
                    .repartition(n_shards * 4, "__shard")
                    .write.partitionBy("__shard")
                    .mode("overwrite")
                    .parquet(spark_mat)
                )
                print(
                    f"ok   {sys.argv[2]}: engine output materialized once "
                    f"to {spark_mat} ({time.time()-t_mat:.1f}s)",
                    flush=True,
                )

        def run_shard(k: int) -> subprocess.CompletedProcess:
            return subprocess.run(
                [
                    sys.executable,
                    __file__,
                    *sys.argv[1:5],
                    *push,
                    "--shard",
                    str(k),
                ],
                capture_output=True,
                text=True,
            )

        # stream results as shards land (r12): pool.map held every
        # child's output until ALL finished, so a multi-hour sf10 run
        # left the log empty (and a killed parent left NO record of the
        # shards that had already passed)
        from concurrent.futures import as_completed

        with ThreadPoolExecutor(max_workers=n_par) as pool:
            futs = [pool.submit(run_shard, k) for k in shards]
            for fut in as_completed(futs):
                r = fut.result()
                sys.stdout.write(r.stdout)
                sys.stderr.write(r.stderr)
                sys.stdout.flush()
                rc = rc or r.returncode
                m = re.search(r"ok .*: (\d+) rows match", r.stdout)
                if m:
                    shard_rows += int(m.group(1))
        # (r11, ADVICE) coverage-sum assertion: the n shard outputs must
        # PARTITION the full result — if the shard predicate silently
        # drops rows (the negative-key %-sign bug this guards against),
        # the sum of per-shard engine rowcounts diverges from the full
        # unfiltered count and we fail loudly instead of reporting green.
        if "--only" not in sys.argv and rc == 0:
            registry = load_all()
            spark = get_spark("shard_check_cov")
            if spark_mat is not None:
                # the materialized output IS what the shards digested;
                # counting it (rather than re-running the query) makes
                # the coverage sum exact over the same physical rows
                full_n = spark.read.parquet(spark_mat).count()
            else:
                full_n = registry[sys.argv[2]].fn(spark, sys.argv[1]).count()
            if full_n != shard_rows:
                print(
                    f"FAIL {sys.argv[2]}: shard coverage gap — per-shard "
                    f"rows sum to {shard_rows} but full output has {full_n}"
                )
                rc = 1
            else:
                print(
                    f"ok   {sys.argv[2]}: coverage sum {shard_rows} == "
                    f"full count {full_n}"
                )
        print(
            f"{'FAIL' if rc else 'ok  '} {sys.argv[2]}: sharded full-value "
            f"run complete across {len(shards)} process-isolated shards "
            f"(count the per-shard ok lines)"
        )
        return rc

    sf_dir, name, col, n_shards = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        int(sys.argv[4]),
    )
    only_shard = int(sys.argv[sys.argv.index("--shard") + 1])
    push_table = (
        sys.argv[sys.argv.index("--push-table") + 1]
        if "--push-table" in sys.argv
        else None
    )
    push_expr = (
        sys.argv[sys.argv.index("--push-expr") + 1]
        if "--push-expr" in sys.argv
        else None
    )
    inject_marker = (
        sys.argv[sys.argv.index("--inject-marker") + 1]
        if "--inject-marker" in sys.argv
        else None
    )
    spark_mat = (
        sys.argv[sys.argv.index("--spark-mat") + 1]
        if "--spark-mat" in sys.argv
        else None
    )
    registry = load_all()
    q = registry[name]
    assert q.oracle is not None, f"{name} has no oracle"
    spark = get_spark("shard_check")
    mat_full = None
    if spark_mat is not None:
        mat_full = spark.read.parquet(spark_mat)
        sdf_full = mat_full.drop("__shard")
    else:
        sdf_full = q.fn(spark, sf_dir)
    scols = sdf_full.columns
    stypes = dict(sdf_full.dtypes)
    assert col in scols, f"shard col {col} not in output {scols}"

    total_rows = 0
    failures = 0
    for k in (only_shard,):
        # pmod form: sign-safe for negative keys (r11, ADVICE) — Spark
        # and DuckDB % both keep the dividend's sign, so the bare form
        # would assign negative keys to NO shard.
        pred = shard_predicate(col, k, n_shards)
        t0 = time.time()
        con = duckdb.connect()
        # same env knobs as selfcheck (r11): a lone shard in its own
        # process can use more than the 32GB co-residency default, and
        # the list-fold oracles' peak scales with DuckDB's thread count
        # (per-thread lambda intermediates, not spillable).
        import os as _os

        con.execute(
            f"SET memory_limit='{_os.environ.get('SELFCHECK_DUCK_MEM', '32GB')}'"
        )
        if _os.environ.get("SELFCHECK_DUCK_THREADS"):
            con.execute(
                f"SET threads={int(_os.environ['SELFCHECK_DUCK_THREADS'])}"
            )
        import tempfile

        _sp = _os.path.join("/root/repo/.scale", "ducktmp")
        _os.makedirs(_sp, exist_ok=True)
        con.execute(
            f"SET temp_directory='{tempfile.mkdtemp(prefix='dbs_shard_spill_', dir=_sp)}'"
        )
        if push_expr is not None:
            push_pred = shard_predicate(push_expr, k, n_shards)
        else:
            push_pred = pred
        for t in TABLE_NAMES:
            where = f" WHERE {push_pred}" if t == push_table else ""
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'{where}"
            )
        # --inject-marker TEXT (r11, with --push-expr EXPR): insert the
        # shard predicate on EXPR directly AFTER the (unique) marker text
        # inside the oracle body. Needed when the oracle's heavy work sits
        # behind MATERIALIZED CTEs — materialization is a pushdown
        # BARRIER, so the output-wrapping predicate (and --push-table,
        # which would wrongly filter BOTH sides of a self-join) cannot
        # bound the per-shard compute; injecting into the candidate
        # join's ON clause does (dedup_ppjoin: the prefix enumeration's
        # a-side). Valid iff EXPR-on-candidate-rows == shard column on
        # output rows — and like every predicate in this tool, the
        # assumption is SELF-VERIFYING: the Spark side still filters the
        # true full output, so a wrong injection produces a per-shard
        # digest mismatch or a coverage-sum gap, never a false green.
        oracle_sql = q.oracle
        if inject_marker is not None:
            assert push_expr is not None, "--inject-marker needs --push-expr"
            oracle_sql = build_injected_oracle(
                oracle_sql, inject_marker, push_expr, k, n_shards
            )
        try:
            # with --push-table the base view is already shard-filtered;
            # keeping the outer WHERE too is harmless (idempotent) and
            # preserves the output-filter form when no push is requested.
            # With --inject-marker the outer wrap is SKIPPED: it is the
            # same predicate the injection already applied (the shard
            # column IS the injected expression on the candidate row),
            # and empirically the wrapped form makes DuckDB pick a plan
            # whose arena OOMs where the bare injected oracle fits in
            # 40GB (dedup_ppjoin sf10: COUNT of the bare form passed at
            # 40GB for every shard but one, while the wrapped SELECT *
            # failed at 60GB). Dropping the wrap leans fully on the
            # injection — which the Spark-side compare of the true full
            # output still verifies row-for-row.
            if inject_marker is not None:
                res = con.execute(f"SELECT * FROM ({oracle_sql}) __shard_t")
            else:
                res = con.execute(
                    f"SELECT * FROM ({oracle_sql}) __shard_t WHERE {pred}"
                )
            ocols = [d[0] for d in res.description]
            odig = RowDigest(ocols)
            while True:
                chunk = res.fetchmany(100_000)
                if not chunk:
                    break
                for r in chunk:
                    odig.add_row(r)
        except Exception:
            print(f"FAIL {name} shard {k}: duckdb error\n{traceback.format_exc()}")
            failures += 1
            con.close()
            continue
        problems: list[str] = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            otypes = {
                r[0]: r[1]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM ({q.oracle})"
                ).fetchall()
            }
            for c, st in stypes.items():
                if canon_spark_type(st) != canon_duck_type(otypes.get(c, "?")):
                    problems.append(f"dtype {c}: spark={st} oracle={otypes.get(c)}")
        con.close()
        try:
            sdig = RowDigest(scols)
            from pyspark.sql import functions as F

            if mat_full is not None:
                # partition pruning on __shard bounds the scan to this
                # shard's directory; the exact predicate re-filter means
                # a row the writer misplaced satisfies NEITHER shard's
                # pair of filters and surfaces as a coverage-sum gap
                sfilt = (
                    mat_full.filter(F.col("__shard") == k)
                    .drop("__shard")
                    .filter(F.expr(pred))
                )
            else:
                sfilt = sdf_full.filter(F.expr(pred))
            # (r11) materialize-then-stream, same rationale as selfcheck:
            # toLocalIterator runs one job per partition, serializing the
            # shard's compute to ~2 cores; a scratch-parquet write runs
            # the plan once fully parallel and the stream pays only
            # parquet decode. Fall back to direct streaming on write
            # rejection (NullType literals). Skipped when the input is
            # already the --spark-mat parquet — that IS the scratch copy.
            mat_dir = None
            if mat_full is None and odig.n > 100_000:
                try:
                    import shutil as _sh
                    import tempfile as _tf2

                    _mp = _os.path.join("/root/repo/.scale", "ducktmp")
                    _os.makedirs(_mp, exist_ok=True)
                    mat_dir = _tf2.mkdtemp(prefix="dbs_shard_mat_", dir=_mp)
                    sfilt.write.mode("overwrite").parquet(mat_dir)
                    sfilt = spark.read.schema(sdf_full.schema).parquet(mat_dir)
                except Exception:
                    sfilt = sdf_full.filter(F.expr(pred))
            try:
                for r in sfilt.toLocalIterator(prefetchPartitions=True):
                    sdig.add_row(tuple(r))
            finally:
                if mat_dir is not None:
                    _sh.rmtree(mat_dir, ignore_errors=True)
        except Exception:
            print(f"FAIL {name} shard {k}: spark error\n{traceback.format_exc()}")
            failures += 1
            continue
        if sdig.n != odig.n:
            problems.append(f"rowcount spark={sdig.n} oracle={odig.n}")
        if not problems and not sdig.matches(odig):
            problems.append("values differ")
        if problems:
            print(f"FAIL {name} shard {k}: {'; '.join(problems)}")
            failures += 1
        else:
            total_rows += sdig.n
            print(
                f"ok   {name} shard {k}/{n_shards}: {sdig.n} rows match "
                f"({time.time()-t0:.1f}s)",
                flush=True,
            )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
