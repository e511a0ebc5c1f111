"""Interleaved in-process A/B: AQE partition coalescing policy.

parallelismFirst=true (Spark default) coalesces post-shuffle partitions
only down to defaultParallelism — at 32 local cores over sf0.1 that
leaves dozens of KB-sized tasks per stage, and the 8-core driver run
beating the 32-core run (BENCH_r12_c8: 25.7 s vs 31.2 s) showed the
suite pays ~0.2 s/query of pure task-dispatch overhead. The guide
(§2.2/§9) prescribes size-targeted coalescing instead. Both settings
are runtime-settable SQL confs, so this A/B flips them between samples
in ONE process — no placement noise.

Usage: python tools/ab_coalesce_conf.py <sf_dir> [n_rounds] [query ...]
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
    "feature_quantile_bucket",
    "stats_mannwhitney",
    "fk_integrity_audit",
    "dedup_verified_pairs",
    "dedup_minhash_pairs",
    "text_collocations",
    "tpch_q11_important_stock",
    "text_decontaminate_bloom",
    "tpch_q16_supplier_cnt",
    "flagship_report",
    "text_lm_score",
    "agg_report",
)

MODES = {
    "cores_first": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
    },
    "size_first": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
}


def main() -> None:
    sf_dir = sys.argv[1]
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    names = sys.argv[3:] or list(DEFAULT_QUERIES)
    reg = load_all()
    spark = get_spark("ab_coalesce_conf")

    def apply(mode: str) -> None:
        for k, v in MODES[mode].items():
            spark.conf.set(k, v)

    # warmup (codegen) once per query under each mode
    for mode in MODES:
        apply(mode)
        for name in names:
            reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            drop_dead_blocks(spark)

    samples: dict[tuple[str, str], list[float]] = {}
    for i in range(n_rounds):
        for mode in MODES:
            apply(mode)
            for name in names:
                drop_dead_blocks(spark)
                spark.sparkContext.setJobDescription(f"{name}:{mode}:{i}")
                t0 = time.perf_counter()
                reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.setdefault((name, mode), []).append(time.perf_counter() - t0)

    print(f"{'query':32s} {'cores_first':>12s} {'size_first':>12s}  ratio(min)")
    tot = {m: 0.0 for m in MODES}
    for name in names:
        mins = {m: min(samples[(name, m)]) for m in MODES}
        meds = {m: statistics.median(samples[(name, m)]) for m in MODES}
        for m in MODES:
            tot[m] += mins[m]
        print(
            f"{name:32s} {mins['cores_first']:8.3f}/{meds['cores_first']:.3f} "
            f"{mins['size_first']:8.3f}/{meds['size_first']:.3f}  "
            f"{mins['cores_first'] / mins['size_first']:.2f}x"
        )
    print(f"{'TOTAL(min)':32s} {tot['cores_first']:12.3f} {tot['size_first']:12.3f}")


if __name__ == "__main__":
    main()
