"""Interleaved in-process A/B: per-table widen policy at a given SF.

tools/ab_widen.py showed the keyed widen is a net win at sf0.1 but
mixed per query (agg_report 1.65x win, snapshot_diff 0.51x loss). The
policy set `catalog._WIDEN_TABLES` is patched between samples to find
which tables earn their exchange.

Usage: python tools/ab_widen_policy.py <sf_dir> [n_rounds] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_bridge_spark import catalog
from data_bridge_spark.registry import load_all
from data_bridge_spark.session import drop_dead_blocks, get_spark

ALL = frozenset(catalog._WIDEN_KEYS)
DIMS = frozenset({"customer", "supplier", "part", "nation", "region"})

POLICIES = {
    "all": ALL,
    "no_dims": ALL - DIMS,
    "facts_no_orders": ALL - DIMS - {"orders"},
    "none": frozenset(),
}

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
    "window_running",
    "win_tumbling",
)


def main() -> None:
    sf_dir = sys.argv[1]
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or list(DEFAULT_QUERIES)
    reg = load_all()
    spark = get_spark("ab_widen_policy")

    for pol in POLICIES.values():  # codegen warmup
        catalog._WIDEN_TABLES = pol
        for name in names:
            reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            drop_dead_blocks(spark)

    samples: dict[tuple[str, str], list[float]] = {}
    for i in range(n_rounds):
        for pname, pol in POLICIES.items():
            catalog._WIDEN_TABLES = pol
            for name in names:
                drop_dead_blocks(spark)
                spark.sparkContext.setJobDescription(f"{name}:{pname}:{i}")
                t0 = time.perf_counter()
                reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.setdefault((name, pname), []).append(time.perf_counter() - t0)
    catalog._WIDEN_TABLES = ALL

    cols = list(POLICIES)
    print(f"{'query':28s} " + " ".join(f"{c:>16s}" for c in cols) + "   (min/med)")
    tot = {c: 0.0 for c in cols}
    for name in names:
        cells = []
        for c in cols:
            ts = samples[(name, c)]
            tot[c] += min(ts)
            cells.append(f"{min(ts):7.3f}/{statistics.median(ts):.3f}")
        print(f"{name:28s} " + " ".join(f"{x:>16s}" for x in cells))
    print(f"{'TOTAL(min)':28s} " + " ".join(f"{tot[c]:16.3f}" for c in cols))


if __name__ == "__main__":
    main()
