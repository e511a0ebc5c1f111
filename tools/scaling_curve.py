"""Measure the scaling curve of a scale-critical query subset across
data decades (sf0.1 → sf1 → sf10) and print per-decade exponents.

bench.py owns the official 41-query headline record at one SF; this
tool owns the CROSS-SF story: the same min-of-2 noop-write protocol,
run at each supplied data dir, with the per-decade scaling exponent
log10(t_hi/t_lo) for adjacent decades. Exponent 0 = flat (overhead- or
under-fed-core-bound), 1 = linear, >1 = super-linear (a plan that will
not survive the next decade). `join_range_binned` is deliberately not
in the subset: its OUTPUT grows density^2 under the key-shifted upscale
(SCALE.md), so its wall measures the synthetic data's density artifact,
not the plan.

Usage: python tools/scaling_curve.py DIR [DIR ...]
Prints one JSON line per dir plus a final exponent table (markdown).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_bridge_spark.registry import load_all
from data_bridge_spark.session import get_spark

SUBSET = (
    "flagship_report",
    "fk_integrity_audit",
    "text_lm_score",
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_pairs",
    "dedup_verified_pairs",
    # the iterative CC closure family (round 7: oracle-feasible at every
    # decade, so the loop's own scaling is now measured, not argued)
    "dedup_clusters",
    "split_leakage_free",
    "tpch_q21_waiting",
    "tpch_q18_large_orders",
    "tpch_q5_local_volume",
    "join_inner",
    "win_tumbling",
    "win_session",
    "events_rolling_active",
    "text_quality",
    "events_pivot",
)

# targeted runs: SCALING_SUBSET=name,name python tools/scaling_curve.py ...
_env_subset = os.environ.get("SCALING_SUBSET")
if _env_subset:
    SUBSET = tuple(n for n in _env_subset.split(",") if n)


def main() -> None:
    dirs = sys.argv[1:]
    if not dirs:
        raise SystemExit("usage: scaling_curve.py DIR [DIR ...]")
    registry = load_all()
    spark = get_spark("scaling_curve")

    from data_bridge_spark.session import drop_dead_blocks as _ddb

    def drop_dead_blocks() -> None:
        _ddb(spark)

    # one warm pass at the smallest dir: amortize codegen out of timings
    warm = dirs[0]
    for name in SUBSET:
        registry[name].fn(spark, warm).write.format("noop").mode("overwrite").save()
    drop_dead_blocks()

    results: dict[str, dict[str, float]] = {}
    for d in dirs:
        timings: dict[str, float] = {}
        for name in SUBSET:
            samples: list[float] = []
            while len(samples) < 2 or (min(samples) < 1.0 and len(samples) < 3):
                drop_dead_blocks()
                t0 = time.perf_counter()
                registry[name].fn(spark, d).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            timings[name] = round(min(samples), 3)
        results[d] = timings
        print(json.dumps({"dir": d, "total": round(sum(timings.values()), 3), "queries": timings}), flush=True)

    import math

    headers = [os.path.basename(d.rstrip("/")) for d in dirs] + [
        f"exp d{i}" for i in range(1, len(dirs))
    ]
    print("\n| query | " + " | ".join(headers) + " |")
    print("|" + "---|" * (len(headers) + 1))
    for name in SUBSET + ("TOTAL",):
        row = [
            sum(results[d].values()) if name == "TOTAL" else results[d][name]
            for d in dirs
        ]
        exps = [
            (math.log10(row[i] / row[i - 1]) if row[i - 1] > 0 else float("nan"))
            for i in range(1, len(row))
        ]
        cells = [f"{v:.2f}" for v in row] + [f"{e:.2f}" for e in exps]
        print(f"| {name} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
