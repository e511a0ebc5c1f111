"""Interleaved in-process A/B: the catalog key-hash widen, on vs off.

The widen (catalog.py: repartition(n, pk) on small single-row-group
test files) was the r12 round's largest claimed win; the r12 evidence
was cross-round bench deltas. DBS_NO_WIDEN is read per Tables()
construction, i.e. per fn() call, so this tool flips it between samples
in ONE process — direct interleaved proof at any SF (r13, verdict
item 5: prove the widen at sf1).

Usage: python tools/ab_widen.py <sf_dir> [n_rounds] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_bridge_spark.registry import load_all
from data_bridge_spark.session import drop_dead_blocks, get_spark

DEFAULT_QUERIES = (
    "tpch_q3_shipping",
    "tpch_q5_local_volume",
    "tpch_q18_large_orders",
    "tpch_q21_waiting",
    "join_left",
    "snapshot_diff",
    "window_rank",
    "flagship_report",
    "fk_integrity_audit",
    "agg_report",
)


def main() -> None:
    sf_dir = sys.argv[1]
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    names = sys.argv[3:] or list(DEFAULT_QUERIES)
    reg = load_all()
    spark = get_spark("ab_widen")

    def set_mode(widen: bool) -> None:
        if widen:
            os.environ.pop("DBS_NO_WIDEN", None)
        else:
            os.environ["DBS_NO_WIDEN"] = "1"

    for widen in (True, False):  # codegen warmup
        set_mode(widen)
        for name in names:
            reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            drop_dead_blocks(spark)

    samples: dict[tuple[str, bool], list[float]] = {}
    for i in range(n_rounds):
        for widen in (True, False):
            set_mode(widen)
            for name in names:
                drop_dead_blocks(spark)
                spark.sparkContext.setJobDescription(f"{name}:widen={widen}:{i}")
                t0 = time.perf_counter()
                reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.setdefault((name, widen), []).append(time.perf_counter() - t0)
    set_mode(True)

    print(f"{'query':32s} {'widen min/med':>14s} {'no-widen min/med':>17s}  widen_speedup(min)")
    tot = {True: 0.0, False: 0.0}
    for name in names:
        mins = {w: min(samples[(name, w)]) for w in (True, False)}
        meds = {w: statistics.median(samples[(name, w)]) for w in (True, False)}
        tot[True] += mins[True]
        tot[False] += mins[False]
        print(
            f"{name:32s} {mins[True]:7.3f}/{meds[True]:.3f} {mins[False]:9.3f}/{meds[False]:.3f}  "
            f"{mins[False] / mins[True]:.2f}x"
        )
    print(f"{'TOTAL(min)':32s} {tot[True]:14.3f} {tot[False]:17.3f}")


if __name__ == "__main__":
    main()
