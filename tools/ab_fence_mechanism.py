"""Interleaved in-process A/B: plan_once (persist) vs lineage_cut
(localCheckpoint) as the multi-consumer fence mechanism, per headline
query.

r12 switched non-loop fences from localCheckpoint to persist on a
BUILD-time measurement (driver build 14.7->5.2 s over the 12
heaviest-build queries). r13 isolated A/Bs (bloom, fqb) show persist
costs 0.3-0.5 s MORE at execution on queries whose fence feeds
broadcast builds — the columnar cache pays a conversion the raw
localCheckpoint blocks don't. This tool times each fence-using headline
query under both mechanisms by rebinding the plan_once symbol inside
every operator module between samples (operators import it by name).

Usage: python tools/ab_fence_mechanism.py <sf_dir> [n_rounds] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_bridge_spark import session as dbs_session
from data_bridge_spark.registry import load_all
from data_bridge_spark.session import drop_dead_blocks, get_spark

FENCE_HEADLINE = (
    "feature_quantile_bucket",
    "stats_mannwhitney",
    "text_collocations",
    "text_decontaminate_bloom",
    "dedup_minhash_pairs",
    "dedup_verified_pairs",
    "fk_integrity_audit",
    "win_session",
    "events_pivot",
    "text_lm_score",
    "corpus_prep_pipeline",
    "flagship_report",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_cnt",
)


def _rebind(fn) -> None:
    """Point every operator module's plan_once at fn."""
    for name, mod in list(sys.modules.items()):
        if name.startswith("data_bridge_spark") and getattr(mod, "plan_once", None):
            mod.plan_once = fn


def main() -> None:
    sf_dir = sys.argv[1]
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reg = load_all()
    names = sys.argv[3:] or [n for n in FENCE_HEADLINE if n in reg]
    spark = get_spark("ab_fence_mechanism")

    persist_fence = dbs_session.plan_once
    ckpt_fence = dbs_session.lineage_cut
    modes = {"persist": persist_fence, "ckpt": ckpt_fence}

    for mode, fn in modes.items():  # codegen warmup
        _rebind(fn)
        for name in names:
            reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            drop_dead_blocks(spark)

    samples: dict[tuple[str, str], list[float]] = {}
    for i in range(n_rounds):
        for mode, fn in modes.items():
            _rebind(fn)
            for name in names:
                drop_dead_blocks(spark)
                spark.sparkContext.setJobDescription(f"{name}:{mode}:{i}")
                t0 = time.perf_counter()
                reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.setdefault((name, mode), []).append(time.perf_counter() - t0)
    _rebind(persist_fence)

    print(f"{'query':32s} {'persist min/med':>16s} {'ckpt min/med':>16s}  ckpt_speedup(min)")
    tot = {m: 0.0 for m in modes}
    for name in names:
        mins = {m: min(samples[(name, m)]) for m in modes}
        meds = {m: statistics.median(samples[(name, m)]) for m in modes}
        for m in modes:
            tot[m] += mins[m]
        print(
            f"{name:32s} {mins['persist']:7.3f}/{meds['persist']:.3f} "
            f"{mins['ckpt']:8.3f}/{meds['ckpt']:.3f}  {mins['persist'] / mins['ckpt']:.2f}x"
        )
    print(f"{'TOTAL(min)':32s} {tot['persist']:16.3f} {tot['ckpt']:16.3f}")


if __name__ == "__main__":
    main()
