"""Task-retry determinism sweep: the full oracle corpus re-run with task
failures INJECTED, proving every query's answer is retry-invariant.

Local mode defaults to ``spark.task.maxFailures=1`` (any task failure kills
the job), so ordinary sweeps never exercise Spark's retry path at all. This
sweep (a) runs under ``local[N,4]`` — N threads, 4 task attempts — and
(b) wraps every catalog table scan in a ``mapInPandas`` fault that raises on
partition 0's FIRST attempt (``TaskContext.attemptNumber() == 0``), so every
scan stage of every query loses a task once and recomputes it. A query whose
result depends on which attempt produced a partition (RNG per attempt,
attempt-ordered folds, non-idempotent accumulation into a sink) diverges
from the DuckDB oracle here even though the plain sweep passes.

The injection is scan-level because that is the only lineage point Python
code can reach for JVM-only stages; downstream shuffle stages consume the
retried task's re-produced output, which is exactly the recompute path a
lost executor triggers at 100 TB.

Comparison machinery is selfcheck's own (strict full-value multiset vs
DuckDB) — this file only swaps the session factory and the catalog scan.

Usage: python tools/retry_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import selfcheck  # noqa: E402

import data_bridge_spark.catalog as catalog  # noqa: E402
import data_bridge_spark.session as session  # noqa: E402


def _get_spark_retry(app_name: str = "retry_sweep", **_ignored):
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    return session.get_spark(
        app_name,
        master=f"local[{cpus},4]",  # the ,4 = spark.task.maxFailures
        shuffle_partitions=cpus,
    )


_real_table = catalog.Tables.table


def _table_with_fault(self: catalog.Tables, name: str):
    from pyspark import TaskContext

    # Cache the WRAPPED plan: operators join two accesses of the same
    # table by column reference (t.orders.o_custkey), which requires the
    # same DataFrame (same expression ids) on every access — re-wrapping
    # per call would mint fresh ids and break attribute resolution.
    key = f"__fault__{name}"
    if key in self._cache:
        return self._cache[key]
    df = _real_table(self, name)

    def fail_first_attempt(batches):
        ctx = TaskContext.get()
        if ctx is not None and ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            raise RuntimeError(
                "retry_sweep: injected first-attempt task failure"
            )
        yield from batches

    # mapInArrow, NOT mapInPandas: the injector only raises — it never
    # touches the data — and the pandas hop would corrupt what it merely
    # passes through (datetime64[ns] cannot hold the edgevals fixture's
    # year-9999 timestamps, so retry x edgevals failed in the INJECTOR
    # while the engine under test was fine). Arrow batches pass through
    # byte-exact for every type.
    self._cache[key] = df.mapInArrow(fail_first_attempt, df.schema)
    return self._cache[key]


def main() -> int:
    selfcheck.get_spark = _get_spark_retry
    catalog.Tables.table = _table_with_fault
    print("retry_sweep: local[N,4], scan partition 0 fails first attempt")
    return selfcheck.main()


if __name__ == "__main__":
    sys.exit(main())
