"""Plan-shape metrics for every registered query: one JSON line each.

Usage: python tools/plan_metrics.py <out.jsonl> [name ...]

Counts the plan nodes that cost at scale — Exchange (shuffles), join
strategies, Python-boundary nodes, scans, sorts — so an optimization round
can rank all 234 queries by structural cost instead of guessing. Counts are
taken from the numbered operator list of .explain("formatted") (the section
before the per-node details), so reused exchanges are counted once.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_bridge_spark.registry import load_all
from data_bridge_spark.session import drop_dead_blocks, get_spark

NODES = (
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "PythonMapInArrow",
    "Scan parquet",
    "Sort",
    "Window",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "Generate",
    "Union",
)


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    registry = load_all()
    if not names:
        names = sorted(registry)
    spark = get_spark("plan_metrics")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    with open(out_path, "w") as out:
        for name in names:
            t0 = time.perf_counter()
            try:
                df = registry[name].fn(spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df.queryExecution() if hasattr(df, "queryExecution") else df._jdf.queryExecution(),
                    "formatted",
                )
            except Exception as e:  # noqa: BLE001
                out.write(json.dumps({"name": name, "error": str(e)[:200]}) + "\n")
                out.flush()
                continue
            # operator list = lines like "* Name (3)" / "+- Name (4)" before
            # details. Deduped by node id (r12): a persist fence's subtree is
            # PRINTED once per consumer (same node numbers each time) but
            # executes once — line-occurrence counting overstated fenced plans
            # by the consumer count.
            seen: dict[int, str] = {}
            for line in plan.splitlines():
                m = re.match(
                    r"^[\s:+*-]*([A-Za-z][A-Za-z0-9 ]*?)(?: [a-z].*)? \((\d+)\)\s*$",
                    line,
                )
                if m:
                    seen.setdefault(int(m.group(2)), line)
                elif line.startswith("("):  # details section starts
                    break
            ops = "\n".join(seen.values())
            # op_count marker (ADVICE r12): node-id dedup changed the
            # counting scheme vs pre-r12 artifacts — tag records so
            # cross-round comparisons can detect which scheme they mix
            rec: dict[str, object] = {
                "name": name,
                "op_count": "dedup-v2",
                "plan_build_s": round(time.perf_counter() - t0, 2),
            }
            for node in NODES:
                c = len(re.findall(rf"\b{re.escape(node)}\b", ops))
                if c:
                    rec[node] = c
            rec["n_ops"] = len(seen)
            out.write(json.dumps(rec) + "\n")
            out.flush()
            drop_dead_blocks(spark)


if __name__ == "__main__":
    main()
