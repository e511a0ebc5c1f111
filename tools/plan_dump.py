"""Dump .explain("formatted") for registered queries to plans/<tag>/.

Usage: python tools/plan_dump.py <outdir> <suffix> [name ...]
  outdir  e.g. plans/r12
  suffix  e.g. before | after
  names   query names; default = bench.py HEADLINE set

Writes <outdir>/<name>_<suffix>.txt per query. Judges read these to check
plan claims (Exchange counts, join strategies, PushedFilters) without
running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_bridge_spark.registry import load_all
from data_bridge_spark.session import get_spark


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    registry = load_all()
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan_dump")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
