"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query runs against the noop sink (`format("noop")`) so the full plan
executes — count() alone would let Catalyst prune projections and
under-report the work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_bridge_spark.registry import load_all
from data_bridge_spark.session import get_spark

# the headline set: one representative per operator family, heaviest first
HEADLINE = (
    "flagship_report",
    "agg_report",
    "join_inner",
    "join_left",
    "window_rank",
    "window_running",
    "sort_topk",
    "agg_rollup",
    "dedup_exact",
    "dedup_minhash",
    "sim_topk",
    "text_quality",
    "win_session",
    "win_tumbling",
    "events_pivot",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    registry = load_all()
    spark = get_spark("bench")

    # warm the JVM once — codegen, shuffle infra, broadcast machinery —
    # so timings measure the engine, not first-query initialization.
    # Each headline query runs once at the smallest SF first: same plan
    # shapes, so whole-stage-codegen compilation is amortized out of the
    # timed runs (standard steady-state benching practice).
    warm_dir = "/root/testdata/sf0.001"
    warm_sf = warm_dir if os.path.isdir(warm_dir) else sf_dir
    for name in HEADLINE:
        registry[name].fn(spark, warm_sf).write.format("noop").mode("overwrite").save()

    # two timed runs, keep the min: the local machine is shared/noisy and
    # a single sample can be 2x off; min-of-2 reports engine capability
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name].fn
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
