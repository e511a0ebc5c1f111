"""Table catalog over the test parquet directories.

The reference materializes every extract eagerly (reference
``app/utils/extractor.py:96-105`` does ``fetchall()`` into pandas); here a
"table" is a lazy ``spark.read.parquet`` plan so Catalyst sees column
pruning and predicate pushdown opportunities across the whole query.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLE_NAMES", "Tables", "default_sf_dir"]

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_ts(df: DataFrame, as_ntz: bool = True) -> DataFrame:
    """Normalize events.ts to microsecond precision across data vintages.

    The testdata generator has written ts as either TIMESTAMP(NANOS) —
    which Spark's reader rejects unless nanos are read as long (legacy
    ``spark.sql.legacy.parquet.nanosAsLong``) and rebuilt, flooring to
    micros exactly as DuckDB does when fetching ns timestamps — or plain
    TIMESTAMP(MICROS)/NTZ. Branch on the scanned type so both vintages
    read identically, for batch and streaming scans alike. Floor division
    is done as ``(ts - pmod(ts, 1000)) DIV 1000`` — exact integer
    arithmetic that floors for negative (pre-epoch) nanos too, where a
    bare ``DIV`` would truncate toward zero and drift 1µs from DuckDB.

    ``as_ntz=True`` (batch/oracle path) yields TIMESTAMP_NTZ to match
    DuckDB's naive timestamps; ``as_ntz=False`` yields TIMESTAMP, which
    watermarks/event-time require (the session tz is pinned UTC, so the
    two render identical instants)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    target = "timestamp_ntz" if as_ntz else "timestamp"
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        micros = "timestamp_micros((ts - pmod(ts, 1000L)) DIV 1000)"
        return df.withColumn("ts", F.expr(f"CAST({micros} AS {target})"))
    return df.withColumn("ts", F.col("ts").cast(target))


# Post-scan widening: the test parquet files are single-row-group, so the
# scan is one task no matter spark.sql.files.maxPartitionBytes — every
# downstream expression would run on one core. Files in this size band get
# an explicit repartition to cluster width. On a real deployment (files
# with many row groups / many files) the scan is already wider than the
# core count and the widen never fires.
#
# r13: MAX tightened 2 GB -> 16 MB on direct interleaved evidence
# (tools/ab_widen.py, DBS_NO_WIDEN flipped between samples in one
# process). The widen trades one full-table exchange for parallelism of
# the scan-stage work; that trade inverts as the table grows — shipping
# every row costs more than the serial partial work it parallelizes.
# Measured: at sf0.1 (largest file 10.8 MB) widen-on wins 10.11->9.25 s
# over the 10-query probe set; at sf1 (lineitem 184 MB, orders 30 MB,
# events 21 MB) widen-on LOSES 16.36->18.55 s, with the losses exactly
# on the >16 MB tables (agg_report 0.71x, window_rank 0.68x,
# fk 0.88x). 16 MB keeps every sf0.1 file inside the band (driver bench
# behavior unchanged) and stops the mechanism where the decade of
# measurement says it hurts.
_WIDEN_MIN_BYTES = 150 * 1024
_WIDEN_MAX_BYTES = 16 * 1024**2

# r12 (optimization): the widen hash-partitions on each table's primary
# key instead of round-robin. A keyless repartition(n) costs an extra
# LOCAL SORT of its entire input inside the (single) scan task
# (spark.sql.execution.sortBeforeRepartition, on by default so retried
# tasks reproduce their row-to-partition assignment — a hash key is
# deterministic by construction, so it needs no such sort), and its
# RoundRobinPartitioning can never satisfy a downstream distribution
# requirement. HashPartitioning(pk, n) satisfies ClusteredDistribution
# for every aggregation/join keyed on the pk — EnsureRequirements then
# inserts NO exchange for the first keyed operation on the table (the
# measured flagship_report plan: scan→widen→agg→join ran 2 exchanges on
# lineitem before, 1 after). The keys are the near-unique primary keys,
# so the hash spreads uniformly (guide §2.5: use keys with far more
# distinct values than partitions). Skew on a real deployment is not a
# concern here — the widen never fires there.
_WIDEN_KEYS = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "nation": "n_nationkey",
    "region": "r_regionkey",
}

# Which tables the widen may fire on (within the size band). Kept as a
# module-level set so policy experiments can patch it per sample
# (tools/ab_widen_policy.py); default = every table, the r12 behavior.
_WIDEN_TABLES = frozenset(_WIDEN_KEYS)


# r12 (optimization): per-session cache of the RAW spark.read.parquet
# plans. Each registered query's fn() constructs a fresh Tables, and
# every read.parquet call costs a driver round trip that reads the file
# footer for schema inference — profiled at ~0.1 s per table per query
# BUILD (fk_integrity_audit: 7 tables, ~0.7 s of its 0.9 s build; the
# bench builds each query 2-4 times). A DataFrame is an immutable plan,
# so the un-widened read is shared across Tables instances of the same
# session; the widen (env-dependent) and per-instance cache stay
# per-Tables. Keyed by the live SparkSession object — a restarted
# session is a new object and gets fresh reads; entries die with the
# process (bounded: #sessions x #tables lazy plans). r13 (ADVICE): the
# guard is a weakref so a stopped+collected session's cached plans are
# reclaimable (a strong ref pinned them for process lifetime and made
# the id()-reuse branch dead code), and entries are keyed by
# (path, mtime_ns, size) so a parquet file regenerated in place gets a
# fresh plan instead of a stale schema.
_RAW_READS: dict[int, tuple[object, dict[tuple, DataFrame]]] = {}


class Tables:
    """Lazy accessor: ``Tables(spark, sf_dir).lineitem`` → DataFrame plan.

    Each attribute is a fresh ``spark.read.parquet`` logical plan; no data
    moves until an action. ``view()`` registers temp views for SQL-form
    operators. Filters/projections still push into the scan below the
    widen repartition (Catalyst pushes predicates through Repartition).
    """

    def __init__(self, spark: SparkSession, sf_dir: str | None = None, widen: bool = True):
        self.spark = spark
        self.sf_dir = sf_dir or default_sf_dir()
        self.widen = widen and os.environ.get("DBS_NO_WIDEN") != "1"
        self._cache: dict[str, DataFrame] = {}
        # Pin the confs result-correctness depends on, so queries behave
        # identically on ANY caller-provided session (the grading driver
        # builds its own): UTC session tz (the events nanos→NTZ rebuild
        # renders instants in session tz) and NTZ inference for the
        # naive-timestamp parquet columns. Both are runtime-settable.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # r13 (ADVICE): the dedup minhash expressions parse '\\s+' via
        # F.expr string literals — with the legacy escapedStringLiterals
        # conf enabled the pattern silently becomes a literal
        # backslash-s match and every fingerprint changes. Pin it false
        # (the default) alongside the other correctness-critical confs.
        spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")
        key = id(spark)
        hit = _RAW_READS.get(key)
        # the guard detects id() reuse after a session is GC'd: a
        # weakref sentinel — dead session ⇒ ref() is None ⇒ fresh entry
        if hit is None or hit[0]() is not spark:
            _RAW_READS[key] = (weakref.ref(spark), {})
        self._raw = _RAW_READS[key][1]

    def table(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
        if name not in self._cache:
            path = os.path.join(self.sf_dir, f"{name}.parquet")
            try:
                st = os.stat(path)
                raw_key = (path, st.st_mtime_ns, st.st_size)
            except OSError:
                raw_key = (path, 0, 0)
            df = self._raw.get(raw_key)
            if df is None:
                if name == "events":
                    df = self._read_events(path)
                else:
                    df = self.spark.read.parquet(path)
                self._raw[raw_key] = df
            if self.widen and name in _WIDEN_TABLES:
                try:
                    size = os.path.getsize(path)
                except OSError:
                    size = 0
                if _WIDEN_MIN_BYTES <= size <= _WIDEN_MAX_BYTES:
                    if os.environ.get("DBS_WIDEN_RR") == "1":
                        df = df.repartition(
                            self.spark.sparkContext.defaultParallelism
                        )
                    else:
                        df = df.repartition(
                            self.spark.sparkContext.defaultParallelism,
                            _WIDEN_KEYS[name],
                        )
            self._cache[name] = df
        return self._cache[name]

    def _read_events(self, path: str) -> DataFrame:
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(self.spark.read.parquet(path))

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self.table(name)
        except KeyError as exc:  # pragma: no cover
            raise AttributeError(name) from exc

    def view(self, *names: str) -> None:
        """Register temp views (default: all tables) for spark.sql use."""
        for name in names or TABLE_NAMES:
            self.table(name).createOrReplaceTempView(name)
