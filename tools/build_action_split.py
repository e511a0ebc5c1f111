"""Split DataFrame-BUILD (driver py4j/analysis) vs ACTION (noop write)
time per query — the diagnostic that exposed the localCheckpoint fence
build cost in r12. min-of-N with dead-block drops between samples.

Usage: python tools/build_action_split.py [N_SAMPLES] NAME [NAME ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_bridge_spark.registry import load_all
from data_bridge_spark.session import drop_dead_blocks, get_spark


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0].isdigit():
        n = int(args[0])
        args = args[1:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_all()
    spark = get_spark("build_action_split")
    # warmup at smallest SF + touch target tables (bench.py protocol)
    warm = "/root/testdata/sf0.001"
    for name in names:
        reg[name].fn(spark, warm).write.format("noop").mode("overwrite").save()
    from data_bridge_spark.catalog import TABLE_NAMES, Tables

    t = Tables(spark, sf_dir)
    for tn in TABLE_NAMES:
        t.table(tn).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        builds, actions = [], []
        for _ in range(n):
            drop_dead_blocks(spark)
            t0 = time.perf_counter()
            df = reg[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            actions.append(t2 - t1)
        out[name] = {
            "build": round(min(builds), 3),
            "action": round(min(actions), 3),
            "total": round(min(b + a for b, a in zip(builds, actions)), 3),
        }
        print(f"{name:35s} build={out[name]['build']:.2f} action={out[name]['action']:.2f} total={out[name]['total']:.2f}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "split": out}))


if __name__ == "__main__":
    main()
