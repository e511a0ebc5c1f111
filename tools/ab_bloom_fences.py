"""Interleaved in-process A/B: text_decontaminate_bloom fence variants +
join_range stability probe (r12 verdict item 4 — the two queries whose
r12 evidence was contradicted between builder A/B and driver bench).

Variants:
  current — bench shingles plan_once + lane table plan_once (r12)
  nolanes — bench shingles plan_once only; the m/64-row lane fold
            rebuilds per probe join (reads the cached bench)
  r11     — bench shingles lineage_cut (localCheckpoint), no lane fence

join_range has zero r12/r13 diff; it is timed alongside to measure its
noise band on one host (driver saw 0.33→0.52 s on identical code).

Usage: python tools/ab_bloom_fences.py <sf_dir> [n_rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_bridge_spark.catalog import Tables
from data_bridge_spark.operators.corpus import _BENCH_MAX_DOC, _BLOOM_K, _bloom_pos, _ngrams, _words
from data_bridge_spark.registry import load_all
from data_bridge_spark.session import drop_dead_blocks, get_spark, lineage_cut, plan_once


def bloom(t: Tables, variant: str) -> DataFrame:
    tri = t.documents.select(
        "doc_id", F.explode(_ngrams(_words(F.col("text")), 3)).alias("shingle")
    )
    bench = tri.filter(F.col("doc_id") < _BENCH_MAX_DOC).select("shingle").distinct()
    bench = lineage_cut(bench) if variant.startswith("r11") else plan_once(bench)
    lanes = (
        bench.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("shingle"), i) for i in range(_BLOOM_K)])
            ).alias("pos")
        )
        .select(
            F.floor(F.col("pos") / 64).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    if variant in ("current", "r11_lanespersist"):
        lanes = plan_once(lanes)
    elif variant == "r11_lanesckpt":
        lanes = lineage_cut(lanes)
    cand = tri.filter(F.col("doc_id") >= _BENCH_MAX_DOC)
    for i in range(_BLOOM_K):
        lane = lanes.select(F.col("w").alias(f"w{i}"), F.col("bits").alias(f"bits{i}"))
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos{i}, 64) AS INT))")
        cand = (
            cand.withColumn(f"pos{i}", _bloom_pos(F.col("shingle"), i))
            .join(F.broadcast(lane), F.floor(F.col(f"pos{i}") / 64) == F.col(f"w{i}"), "inner")
            .filter(F.col(f"bits{i}").bitwiseAND(mask) != 0)
            .drop(f"w{i}", f"bits{i}", f"pos{i}")
        )
    return (
        cand.distinct()
        .join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def main() -> None:
    sf_dir = sys.argv[1]
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    reg = load_all()
    spark = get_spark("ab_bloom")
    t = Tables(spark, sf_dir)
    variants = ("current", "r11", "r11_lanespersist", "r11_lanesckpt")

    rows0 = sorted(map(tuple, bloom(t, "current").collect()))
    for v in variants[1:]:
        assert sorted(map(tuple, bloom(t, v).collect())) == rows0, f"{v} differs"
        drop_dead_blocks(spark)
    print(f"parity OK ({len(rows0)} rows)")

    for v in variants:  # codegen warmup
        bloom(t, v).write.format("noop").mode("overwrite").save()
        drop_dead_blocks(spark)
    reg["join_range"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {}
    for i in range(n_rounds):
        for v in variants:
            drop_dead_blocks(spark)
            spark.sparkContext.setJobDescription(f"bloom:{v}:{i}")
            t0 = time.perf_counter()
            bloom(t, v).write.format("noop").mode("overwrite").save()
            samples.setdefault(f"bloom:{v}", []).append(time.perf_counter() - t0)
        drop_dead_blocks(spark)
        spark.sparkContext.setJobDescription(f"join_range:{i}")
        t0 = time.perf_counter()
        reg["join_range"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.setdefault("join_range", []).append(time.perf_counter() - t0)

    for k, ts in sorted(samples.items()):
        print(
            f"{k:14s} min {min(ts):.3f}  median {statistics.median(ts):.3f}  "
            f"all {[round(x, 3) for x in ts]}"
        )


if __name__ == "__main__":
    main()
