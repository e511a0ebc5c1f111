"""Interleaved A/B timing of one source tree — the drift-vs-regression
forensic the r5 verdict asked for.

Usage: python tools/ab_drift.py TREE_PATH [QUERY ...]

Runs the given queries at sf0.1 against the data_bridge_spark package
rooted at TREE_PATH (a git worktree of any commit), one timed sample per
query, bench.py's methodology (sf0.001 warmup of the same plans, target
tables touched once, dead checkpoint blocks dropped between samples,
noop sink so the full plan executes), and prints one JSON line
{"tree": ..., "queries": {name: sec}}.

The caller (tools/ab_drift.sh-style loop) alternates trees A/B/A/B in
one session on an idle host and aggregates min-per-variant, so host
drift between trials cancels instead of landing on one variant.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    queries = sys.argv[2:]
    sys.path.insert(0, tree)

    from data_bridge_spark.registry import load_all
    from data_bridge_spark.session import get_spark

    registry = load_all()
    spark = get_spark("ab_drift")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    for name in queries:
        registry[name].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    from data_bridge_spark.catalog import TABLE_NAMES, Tables

    t = Tables(spark, sf_dir)
    for tname in TABLE_NAMES:
        t.table(tname).write.format("noop").mode("overwrite").save()

    try:
        from data_bridge_spark.session import drop_dead_blocks as _ddb
    except ImportError:
        # older A/B trees predate the shared helper — same semantics inline
        def _ddb(s) -> None:
            for rdd in list(s.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist(True)

    def drop_dead_blocks() -> None:
        _ddb(spark)

    timings: dict[str, float] = {}
    for name in queries:
        drop_dead_blocks()
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    print(json.dumps({"tree": tree, "queries": timings}))


if __name__ == "__main__":
    main()
