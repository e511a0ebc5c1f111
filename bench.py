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
    # so timings measure the engine, not first-query initialization
    for warm in ("src_scan", "agg_group", "join_broadcast"):
        registry[warm].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

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
