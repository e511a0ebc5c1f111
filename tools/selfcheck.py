"""Self-check harness: emulates the driver's correctness gate locally.

For every registered query: run the Spark plan and the DuckDB oracle on
the same sf dir, compare row count, sorted column names, and the full
order-insensitive multiset of values (strict equality after canonical
normalization — at least as strict as any value hash the driver uses).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from data_bridge_spark.catalog import TABLE_NAMES
from data_bridge_spark.registry import load_all
from data_bridge_spark.session import get_spark


def canon(v: object) -> object:
    """Canonical form for cross-engine value comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — strict bit-level compare
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    return str(v)


def rowset(cols: list[str], rows: list[tuple]):
    """Column-name-sorted canonical multiset (Counter — no global sort:
    multiset equality is what the comparison needs, and sorting every
    row with stringified keys dominated sweep wall time at sf0.1)."""
    import collections

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return collections.Counter(tuple(canon(r[i]) for i in order) for r in rows)


# Above this many rows a result's multiset is compared as an order-
# insensitive 128-bit hash SUM instead of a materialized Counter: the
# Counter path holds every canonical tuple in memory (~30 GB for the
# 70M-pair dedup_ppjoin result at sf1), the digest path is O(1) memory.
# Both sides promote at the same row count, so equal results always
# compare in the same mode; unequal counts fail on rowcount regardless.
# The trade-off is diff diagnostics (first differing rows) — kept for
# every result under the threshold, which is all of them except the
# handful of pair-output queries at sf1+. Env override for testing.
import os as _os

_HASH_PROMOTE = int(_os.environ.get("SELFCHECK_HASH_PROMOTE", 2_000_000))


def _rowhash(key: tuple) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(repr(key).encode()).digest(), "big")


class RowDigest:
    """Canonical-multiset accumulator: exact Counter until _HASH_PROMOTE
    rows, then an order-insensitive md5-sum mod 2^128 (same object keeps
    counting either way)."""

    def __init__(self, cols: list[str]):
        import collections

        self.order = sorted(range(len(cols)), key=lambda i: cols[i])
        self.n = 0
        self.counter: dict | None = collections.Counter()
        self.hashsum = 0

    def add_row(self, row: tuple) -> None:
        key = tuple(canon(row[i]) for i in self.order)
        self.n += 1
        if self.counter is not None:
            self.counter[key] += 1
            if self.n > _HASH_PROMOTE:
                for k, c in self.counter.items():
                    self.hashsum = (self.hashsum + c * _rowhash(k)) % (1 << 128)
                self.counter = None
        else:
            self.hashsum = (self.hashsum + _rowhash(key)) % (1 << 128)

    def matches(self, other: "RowDigest") -> bool:
        if self.n != other.n:
            return False
        if self.counter is not None and other.counter is not None:
            return self.counter == other.counter
        for d in (self, other):
            if d.counter is not None:
                for k, c in d.counter.items():
                    d.hashsum = (d.hashsum + c * _rowhash(k)) % (1 << 128)
                d.counter = None
        return self.hashsum == other.hashsum


_HEXDIGITS = "0123456789abcdef"
# dtypes whose CAST(x AS VARCHAR/string) prints identically on both
# engines — the only ones the sql-digest row hash may canonicalize
_DIGEST_OK_DUCK = {"bigint", "integer", "smallint", "tinyint", "hugeint", "varchar", "date"}
_DIGEST_OK_SPARK = {"bigint", "int", "smallint", "tinyint", "string", "date"}


def duck_digest_sql(order: list[str], int_cols: list[str], oracle: str) -> str:
    """DuckDB side of the sql-digest: one aggregate row — COUNT(*), the
    order-insensitive SUM of the 60-bit row hash, and per-int-column
    SUMs — over ORACLE. Factored out of sqldigest_compare (r12) so the
    sharded digest lane (tools/count_shards.py --digest) hashes rows
    with byte-identical canonicalization; see the netstring/NULL-sentinel
    comments in sqldigest_compare for why each piece is what it is."""
    canon_cols = ", ".join(
        f"COALESCE(CAST(length(CAST({c} AS VARCHAR)) AS VARCHAR) || ':' || "
        f"CAST({c} AS VARCHAR), chr(1))"
        for c in order
    )
    hexterms = " + ".join(
        f"CAST(strpos('{_HEXDIGITS}', substr(__h, {i}, 1)) - 1 AS HUGEINT)"
        f" * CAST('{16 ** (15 - i)}' AS HUGEINT)"
        for i in range(1, 16)
    )
    sums = "".join(
        f", COALESCE(SUM(CAST({c} AS HUGEINT)), 0) AS sum_{c}" for c in int_cols
    )
    return (
        f"SELECT COUNT(*) AS n, COALESCE(SUM({hexterms}), 0) AS hsum{sums} "
        f"FROM (SELECT md5(concat_ws('|', {canon_cols})) AS __h, * FROM ({oracle}) t0) t"
    )


def spark_digest_aggs(order: list[str], int_cols: list[str]) -> list:
    """Spark side of the sql-digest: the aggregate columns matching
    duck_digest_sql exactly (same canonical row string, same 60-bit
    hash, decimal(38,0) sums)."""
    from pyspark.sql import functions as F

    sval = [F.col(c).cast("string") for c in order]
    h = F.md5(
        F.concat_ws(
            "|",
            *[
                F.coalesce(
                    F.concat(F.length(v).cast("string"), F.lit(":"), v),
                    F.lit("\x01"),
                )
                for v in sval
            ],
        )
    )
    hval = F.conv(F.substring(h, 1, 15), 16, 10).cast("decimal(38,0)")
    return [
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(hval), F.lit(0).cast("decimal(38,0)")).alias("hsum"),
    ] + [
        F.coalesce(
            F.sum(F.col(c).cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")
        ).alias(f"sum_{c}")
        for c in int_cols
    ]


def sqldigest_compare(con, sdf, oracle: str) -> tuple[list[str], int]:
    """Value-compare a query via engine-side aggregate digests instead of
    row streaming: COUNT(*), an order-insensitive SUM of a 60-bit row hash
    (md5 of the '|'-joined canonical row string, first 15 hex chars parsed
    as an integer — bit-identical on both engines), and per-integer-column
    SUMs. Both digests reduce INSIDE their engine (DuckDB / Spark), so a
    mega-pair result (join_range_binned at sf1: 481M rows) is value-checked
    without materializing or streaming the row set. Returns (problems, n).

    Only int/varchar/date columns are supported in the row hash — their
    VARCHAR casts are identical across engines; anything else fails loudly
    rather than hashing engine-specific text."""
    from pyspark.sql import functions as F

    scols = sdf.columns
    otypes = {
        r[0]: r[1].lower()
        for r in con.execute(f"DESCRIBE SELECT * FROM ({oracle})").fetchall()
    }
    problems: list[str] = []
    if sorted(scols) != sorted(otypes):
        return [f"schema spark={sorted(scols)} oracle={sorted(otypes)}"], -1
    stypes = dict(sdf.dtypes)
    for col, st in stypes.items():
        a, b = canon_spark_type(st), canon_duck_type(otypes[col])
        if a != b:
            problems.append(f"dtype {col}: spark={st} oracle={otypes[col]}")
        if st.lower() not in _DIGEST_OK_SPARK or otypes[col] not in _DIGEST_OK_DUCK:
            problems.append(
                f"sql-digest unsupported dtype for {col}: spark={st} duck={otypes[col]}"
            )
    if problems:
        return problems, -1
    order = sorted(scols)
    int_cols = [c for c in order if stypes[c].lower() not in ("string", "date")]

    # DuckDB side: one aggregate row out of the oracle CTE.
    # Each field is LENGTH-PREFIXED (netstring-style "len:value") before
    # the '|' concat: a bare separator is ambiguous when a varchar value
    # itself contains '|' or \x01 — the edgevals fixture injects exactly
    # those — so ('a|b','c') and ('a','b|c') would digest-equal and mask
    # a real divergence. With the prefix the encoding is a prefix code:
    # no two distinct rows concat to the same string (r10, ADVICE).
    # NB: '||' (NULL-propagating), NOT DuckDB's concat() — concat() SKIPS
    # NULL arguments, so a NULL field would encode as ':' instead of
    # falling through to the chr(1) sentinel like Spark's F.concat does.
    # Both sides are built by the shared duck_digest_sql /
    # spark_digest_aggs helpers (r12) so the sharded digest lane cannot
    # drift from this one.
    duck_sql = duck_digest_sql(order, int_cols, oracle)
    # run ONCE and reuse the cursor — description re-executes the full
    # aggregate otherwise, doubling the 481M-row oracle this lane exists
    # for (r10, ADVICE)
    cur = con.execute(duck_sql)
    orow = cur.fetchone()
    ocols_out = [d[0] for d in cur.description]
    odig = {k: int(v) for k, v in zip(ocols_out, orow)}

    # Spark side: the identical aggregates, reduced executor-side
    srow = sdf.agg(*spark_digest_aggs(order, int_cols)).collect()[0].asDict()
    sdig = {k: int(v) for k, v in srow.items()}

    if sdig["n"] != odig["n"]:
        problems.append(f"rowcount spark={sdig['n']} oracle={odig['n']}")
    elif sdig != odig:
        problems.append(
            f"values differ (sql-digest): spark={sdig} oracle={odig}"
        )
    return problems, sdig["n"]


def canon_spark_type(t: str) -> str:
    t = t.lower()
    if t.startswith("array<") and t.endswith(">"):
        return canon_spark_type(t[6:-1]) + "[]"
    return {
        "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
        "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
        "date": "date", "timestamp_ntz": "ts", "timestamp": "ts",
    }.get(t, t)


def canon_duck_type(t: str) -> str:
    t = t.lower()
    if t.endswith("[]"):
        return canon_duck_type(t[:-2]) + "[]"
    if t.startswith("decimal"):
        return t
    return {
        "bigint": "i64", "hugeint": "i128", "integer": "i32", "smallint": "i16",
        "tinyint": "i8", "double": "f64", "float": "f32", "varchar": "str",
        "boolean": "bool", "date": "date", "timestamp": "ts",
        "timestamp_ns": "ts",
    }.get(t, t)


def main() -> int:
    # usage: selfcheck.py [sf_dir] [name ...] [--exclude name ...]
    # --exclude splits out named queries to run separately; excluded
    # names are printed so a log can't silently pass for a full sweep.
    # (Its original reason is gone: the dedup_clusters/dedup_pipeline
    # closure oracles, once ~40 min EACH at sf0.1, are now K-unrolled
    # with a fixpoint witness and run in seconds — full sweeps need no
    # exclusions.)
    args = sys.argv[1:]

    def take_flag(argv: list[str], flag: str) -> tuple[list[str], set[str]]:
        if flag not in argv:
            return argv, set()
        i = argv.index(flag)
        j = i + 1
        while j < len(argv) and not argv[j].startswith("--"):
            j += 1
        return argv[:i] + argv[j:], set(argv[i + 1 : j])

    # --sqldigest name ...: compare those queries via engine-side aggregate
    # digests (sqldigest_compare) instead of row streaming — closes the one
    # historical sf1 exclusion (join_range_binned, 481M-row oracle output)
    # without materializing the pair list on either engine.
    args, sqldigest = take_flag(args, "--sqldigest")
    args, excluded = take_flag(args, "--exclude")
    # --poison-retried: names already re-judged once after a poison
    # re-exec (r11, ADVICE) — never backed up over again, so the
    # back-up-over-collateral-failures logic below cannot loop.
    args, poison_retried = take_flag(args, "--poison-retried")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    registry = load_all()
    names = [n for n in registry if (not only or n in only) and n not in excluded]
    if excluded:
        print(f"EXCLUDED (not checked here): {sorted(excluded & set(registry))}")

    spark = get_spark("selfcheck")

    def fresh_con():
        # Bound the oracle engine explicitly: DuckDB's default memory_limit
        # is 80% of system RAM, which collides with the co-resident Spark
        # JVM on the big-SF sweeps — the r9 sf10 slice died with a 256KB
        # "bad allocation" inside a sort that runs FINE in 24GB once a real
        # limit (and a spill dir) makes DuckDB spill instead of racing the
        # JVM to the system wall. 32GB handles every oracle through sf10.
        c = duckdb.connect()
        # Env override (r10): a lone heavy oracle in its own process can
        # use more than the 32GB co-residency default — ts_holt_winters'
        # per-key list fold OOM'd the 32GB bound at sf10 while the rest
        # of the host sat idle.
        c.execute(
            f"SET memory_limit='{_os.environ.get('SELFCHECK_DUCK_MEM', '32GB')}'"
        )
        # DuckDB's peak memory for the list-fold oracles scales with its
        # thread count (per-thread lambda intermediates, not spillable) —
        # ts_holt_winters' 9-slot fold at sf10 OOM'd a 90GB bound at the
        # default 32 threads but fits comfortably once capped (r10).
        if _os.environ.get("SELFCHECK_DUCK_THREADS"):
            c.execute(f"SET threads={int(_os.environ['SELFCHECK_DUCK_THREADS'])}")
        import tempfile as _tf

        # spill off /tmp (r11, same reason as session.py's spark.local.dir:
        # /tmp's age-based cleaner vs multi-hour oracle runs)
        _sp = _os.path.join("/root/repo/.scale", "ducktmp")
        _os.makedirs(_sp, exist_ok=True)
        c.execute(
            f"SET temp_directory='{_tf.mkdtemp(prefix='dbs_duck_spill_', dir=_sp)}'"
        )
        for t in TABLE_NAMES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    from data_bridge_spark.session import drop_dead_blocks as _ddb

    def drop_dead_blocks() -> None:
        _ddb(spark)

    def _duck_poisoned() -> bool:
        # One hard oracle OOM poisons the ENTIRE in-process DuckDB arena:
        # con.close() does not release the failed fold's allocations, so
        # every later connect()/execute() in this process dies on
        # kilobyte allocations (sf10, r10: text_lm_score OOM'd, then
        # asof_merge_pandas and even CREATE VIEW failed collaterally).
        try:
            probe = duckdb.connect()
            probe.execute("SELECT 1").fetchone()
            probe.close()
            return False
        except Exception:
            return True

    failures: list[str] = []
    con = None
    for _qi, name in enumerate(names):
        q = registry[name]
        drop_dead_blocks()
        if failures and _duck_poisoned():
            # The process can't run any further oracle — hand the
            # remaining names (INCLUDING the current one: it never ran)
            # to a fresh process appending to the same log. (r11,
            # ADVICE): a SUCCEEDING oracle can be the poisoner, in which
            # case the trailing contiguous FAILs are all collateral (they
            # failed only because the arena was already dead) — back up
            # over them and re-judge them in the fresh process, so the
            # log's final FAIL set only contains names that failed in a
            # healthy arena. A genuine OOM in that block simply fails
            # again in the fresh process; --poison-retried pins each name
            # to at most one such retry, so this cannot loop and each
            # exec still makes progress.
            retry_start = _qi
            while (
                retry_start > 0
                and names[retry_start - 1] in failures
                and names[retry_start - 1] not in poison_retried
            ):
                retry_start -= 1
            collateral = names[retry_start:_qi]
            for c_name in collateral:
                failures.remove(c_name)
                print(
                    f"RETRY {c_name}: FAIL above may be collateral "
                    f"(arena poisoned) — re-judged in the fresh process",
                    flush=True,
                )
            remaining = names[retry_start:]
            print(
                f"RE-EXEC: in-process DuckDB arena poisoned by a prior "
                f"oracle OOM; continuing {len(remaining)} remaining names "
                f"in a fresh process",
                flush=True,
            )
            argv = [sys.executable, _os.path.abspath(__file__), sf_dir] + remaining
            sd = sorted(sqldigest & set(remaining))
            if sd:
                argv += ["--sqldigest", *sd]
            pr = sorted(poison_retried | set(collateral))
            if pr:
                argv += ["--poison-retried", *pr]
            try:
                spark.stop()
            except Exception:
                pass
            import subprocess

            child = subprocess.run(argv)
            print(f"\n(parent) {_qi - len(failures) - len(collateral)}"
                  f"/{retry_start} queries pass in this process before "
                  f"re-exec ({len(collateral)} re-judged in the child)")
            if failures:
                print("failing:", " ".join(failures))
            return child.returncode or (1 if failures else 0)
        # Fresh bounded connection PER QUERY (r10): a heavy oracle can
        # leave the buffer manager's 32GB accounting full even after it
        # SUCCEEDS (sf10: ts_anomaly_resid passed, then every later oracle
        # OOM'd on kilobyte allocations until the process died). Reconnect
        # cost is milliseconds (lazy parquet views); judging each query on
        # its own memory behavior is worth 234 of those.
        if con is not None:
            try:
                con.close()
            except Exception:
                pass
        con = fresh_con()
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        if name in sqldigest and q.oracle is not None:
            try:
                problems, n_digest = sqldigest_compare(con, sdf, q.oracle)
            except Exception:
                print(f"FAIL {name}: sql-digest error\n{traceback.format_exc()}")
                failures.append(name)
                continue
            if problems:
                print(f"FAIL {name}: {'; '.join(problems)}")
                failures.append(name)
            else:
                print(
                    f"ok   {name}: {n_digest} rows match "
                    f"({time.time()-t0:.1f}s, sql-digest)"
                )
                if n_digest == 0:
                    print(f"WARN {name}: 0 rows")
            continue
        if q.oracle is None:
            try:
                n_spark = len(sdf.collect())
            except Exception:
                print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
                failures.append(name)
                continue
            print(f"ok   {name}: rows-only, {n_spark} rows ({time.time()-t0:.1f}s)")
            if n_spark == 0:
                print(f"WARN {name}: 0 rows")
            continue
        # oracle first, streamed — its row count decides whether the
        # Spark side may collect() (exact Counter + diff diagnostics)
        # or must stream through toLocalIterator (digest mode)
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            odig = RowDigest(ocols)
            while True:
                chunk = res.fetchmany(100_000)
                if not chunk:
                    break
                for r in chunk:
                    odig.add_row(r)
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        try:
            sdig = RowDigest(scols)
            if odig.n > _HASH_PROMOTE:
                # (r11) materialize-then-stream: toLocalIterator runs ONE
                # job per partition, so the driver pulls the plan's heavy
                # compute sequentially (~2 cores busy — dedup_embed_lsh's
                # 312M-cosine bucket join projected ~3h at sf10 this way).
                # Writing the result to scratch parquet first executes the
                # plan once with full cluster parallelism; the re-read
                # stream then only pays parquet decode. Parquet round-trips
                # every type the registry emits exactly (it is the source
                # format); NullType literals can't be written, so fall back
                # to direct streaming if the write is rejected.
                src = sdf
                mat_dir = None
                try:
                    import shutil as _sh
                    import tempfile as _tf

                    _mp = _os.path.join("/root/repo/.scale", "ducktmp")
                    _os.makedirs(_mp, exist_ok=True)
                    mat_dir = _tf.mkdtemp(prefix="dbs_selfcheck_mat_", dir=_mp)
                    sdf.write.mode("overwrite").parquet(mat_dir)
                    src = spark.read.schema(sdf.schema).parquet(mat_dir)
                except Exception:
                    src = sdf  # stream the plan directly (slow path)
                try:
                    for r in src.toLocalIterator(prefetchPartitions=True):
                        sdig.add_row(tuple(r))
                finally:
                    if mat_dir is not None:
                        _sh.rmtree(mat_dir, ignore_errors=True)
            else:
                # collect() is capped one past the promote threshold: a
                # Spark-side row explosion (the exact mega-pair class the
                # digest mode exists for) then surfaces as a rowcount FAIL
                # instead of OOMing the driver inside collectToPython
                cap = max(odig.n, _HASH_PROMOTE) + 1
                rows = sdf.limit(cap).collect()
                if len(rows) >= cap:
                    print(
                        f"FAIL {name}: rowcount spark>={cap} (collect capped) "
                        f"oracle={odig.n}"
                    )
                    failures.append(name)
                    continue
                for r in rows:
                    sdig.add_row(tuple(r))
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        problems = []
        if sdig.n != odig.n:
            problems.append(f"rowcount spark={sdig.n} oracle={odig.n}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            stypes = dict(sdf.dtypes)
            otypes = {
                r[0]: r[1]
                for r in con.execute(f"DESCRIBE SELECT * FROM ({q.oracle})").fetchall()
            }
            for col, st in stypes.items():
                a, b = canon_spark_type(st), canon_duck_type(otypes.get(col, "?"))
                if a != b:
                    problems.append(f"dtype {col}: spark={st} oracle={otypes.get(col)}")
        if not problems and not sdig.matches(odig):
            if sdig.counter is not None and odig.counter is not None:
                sset, oset = sdig.counter, odig.counter
                extra_s = sorted(
                    (sset - oset).elements(), key=lambda r: tuple(str(x) for x in r)
                )[:3]
                extra_o = sorted(
                    (oset - sset).elements(), key=lambda r: tuple(str(x) for x in r)
                )[:3]
                problems.append(
                    f"values differ; spark-only: {extra_s} oracle-only: {extra_o}"
                )
            else:
                problems.append("values differ (hash-digest mode, no row diff)")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            mode = "" if sdig.counter is not None else ", digest"
            print(f"ok   {name}: {sdig.n} rows match ({time.time()-t0:.1f}s{mode})")
            if sdig.n == 0:
                print(f"WARN {name}: 0 rows")

    print(f"\n{len(names) - len(failures)}/{len(names)} queries pass")
    if failures:
        print("failing:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
