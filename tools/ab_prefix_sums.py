"""Interleaved in-process A/B: feature_quantile_bucket / stats_ks shapes.

Variants of the _bucketed_prefix_sums consumer wiring (the r12 verdict's
item 3: the fence added a persist job to queries already running 6-8
small jobs at 32 threads):

  v0_current   — fence per_v; helper runs btot as its own groupBy; the
                 caller's grand total is a separate per_v aggregate
                 cross-joined in (one more broadcast job).
  v1_nofence   — r11 shape: no persist fence, Catalyst inlines per_v
                 into every consumer (4 source scans).
  v2_totals    — fence per_v; grand totals ride the offsets window (the
                 tiny ≤n_buckets-row table), so the caller's scalar
                 branch and its broadcast job disappear.

Usage: python tools/ab_prefix_sums.py <sf_dir> [n_rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_bridge_spark.catalog import Tables
from data_bridge_spark.operators.insights import _KS_BUCKETS, _bucketed_prefix_sums
from data_bridge_spark.session import drop_dead_blocks, get_spark, plan_once


def _prefix_with_totals(
    df: DataFrame,
    value_col: str,
    count_cols: tuple[str, ...],
    n_buckets: int = _KS_BUCKETS,
    inclusive: bool = True,
) -> DataFrame:
    """_bucketed_prefix_sums variant: grand totals (`tot_<c>`) attached to
    every output row via the offsets-side window — same exchanges, one
    fewer consumer of df, one fewer broadcast job for callers needing n."""
    vd = F.col(value_col).cast("double")
    rng = df.agg(F.min(vd).alias("_vmin"), F.max(vd).alias("_vmax"))
    bucketed = (
        df.crossJoin(F.broadcast(rng))
        .withColumn(
            "_bucket",
            F.coalesce(
                F.width_bucket(vd, "_vmin", "_vmax", F.lit(n_buckets)), F.lit(1)
            ),
        )
        .drop("_vmin", "_vmax")
    )
    end = Window.currentRow if inclusive else -1
    in_bucket = Window.partitionBy("_bucket").orderBy(F.col(value_col).asc()).rowsBetween(
        Window.unboundedPreceding, end
    )
    local = bucketed
    for c in count_cols:
        local = local.withColumn(
            f"_l_{c}", F.coalesce(F.sum(c).over(in_bucket), F.lit(0))
        )
    btot = bucketed.groupBy("_bucket").agg(
        *[F.sum(c).alias(f"_b_{c}") for c in count_cols]
    )
    prior = Window.orderBy(F.col("_bucket").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    whole = Window.orderBy(F.col("_bucket").asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = btot.select(
        "_bucket",
        *[
            F.coalesce(F.sum(f"_b_{c}").over(prior), F.lit(0)).alias(f"_o_{c}")
            for c in count_cols
        ],
        *[F.sum(f"_b_{c}").over(whole).alias(f"tot_{c}") for c in count_cols],
    )
    out = local.join(F.broadcast(offsets), "_bucket")
    for c in count_cols:
        out = out.withColumn(f"run_{c}", F.col(f"_o_{c}") + F.col(f"_l_{c}"))
    return out.drop("_bucket", *[f"_l_{c}" for c in count_cols], *[f"_o_{c}" for c in count_cols])


def fqb(t: Tables, variant: str) -> DataFrame:
    nn = t.orders.filter(F.col("o_totalprice").isNotNull())
    per_v = nn.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    if variant == "v3_ckptfence":
        from data_bridge_spark.session import lineage_cut

        per_v = per_v.transform(lineage_cut)
    elif variant != "v1_nofence":
        per_v = per_v.transform(plan_once)
    if variant == "v2_totals":
        run = _prefix_with_totals(per_v, "v", ("cnt",)).select(
            "v", "run_cnt", F.col("tot_cnt").alias("n")
        )
        return t.orders.join(run, F.col("o_totalprice") == F.col("v")).select(
            "o_orderkey",
            "o_totalprice",
            (F.expr("((run_cnt - 1) * 10) div n") + 1).cast("int").alias("decile"),
        )
    run = _bucketed_prefix_sums(per_v, "v", ("cnt",)).select("v", "run_cnt")
    tot = per_v.agg(F.sum("cnt").alias("n"))
    return (
        t.orders.join(run, F.col("o_totalprice") == F.col("v"))
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderkey",
            "o_totalprice",
            (F.expr("((run_cnt - 1) * 10) div n") + 1).cast("int").alias("decile"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1]
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab_prefix_sums")
    t = Tables(spark, sf_dir)

    variants = ("v0_current", "v1_nofence", "v2_totals", "v3_ckptfence")
    base = fqb(t, "v0_current").orderBy("o_orderkey")
    rows0 = base.collect()
    for v in variants[1:]:
        rows = fqb(t, v).orderBy("o_orderkey").collect()
        assert rows == rows0, f"{v} disagrees with v0"
        drop_dead_blocks(spark)
    print(f"parity OK across {variants} ({len(rows0)} rows)")

    samples: dict[str, list[float]] = {}
    for v in variants:  # codegen warmup
        fqb(t, v).write.format("noop").mode("overwrite").save()
        drop_dead_blocks(spark)
    for i in range(n_rounds):
        for v in variants:
            drop_dead_blocks(spark)
            spark.sparkContext.setJobDescription(f"fqb:{v}:{i}")
            t0 = time.perf_counter()
            fqb(t, v).write.format("noop").mode("overwrite").save()
            samples.setdefault(v, []).append(time.perf_counter() - t0)
    for v, ts in samples.items():
        print(
            f"{v:12s} min {min(ts):.3f}  median {statistics.median(ts):.3f}  "
            f"all {[round(x, 3) for x in ts]}"
        )


if __name__ == "__main__":
    main()
