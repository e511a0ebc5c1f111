"""Interleaved A/B: text_lm_score scored-join strategy.

The doc-bigram x LM join is the query's only strategy-ambiguous edge
(the LM is vocabulary-bounded but past the default broadcast threshold
at sf0.1, so AQE picks SMJ/SHJ at runtime) and the query's bench
variance is the largest in the suite (0.69-1.9 s across today's runs).
Variants: planner default, SHUFFLE_HASH hint on the LM side, explicit
broadcast of the LM.

Usage: python tools/ab_lm_join.py <sf_dir> [n_rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_bridge_spark.catalog import Tables
from data_bridge_spark.session import drop_dead_blocks, get_spark, plan_once


def lm_score(t: Tables, variant: str):
    ws = F.split(F.lower(F.col("text")), " ")
    n1 = F.greatest(F.size(ws) - 1, F.lit(0))
    pairs = (
        t.documents.select(
            "doc_id",
            F.posexplode(
                F.arrays_zip(F.slice(ws, 1, n1).alias("w1"), F.slice(ws, 2, n1).alias("w2"))
            ).alias("i", "pr"),
        )
        .select("doc_id", "i", F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
        .transform(plan_once)
    )
    cnt = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    lm = cnt.select(
        "w1",
        "w2",
        (F.col("n_pair").cast("double") / F.sum("n_pair").over(W.partitionBy("w1")).cast("double")).alias("p"),
    )
    if variant == "shj":
        lm = lm.hint("shuffle_hash")
    elif variant == "bcast":
        lm = F.broadcast(lm)
    scored = pairs.join(lm, ["w1", "w2"])
    vals = F.transform(F.array_sort(F.collect_list(F.struct("i", "p"))), lambda s: s["p"])
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), vals.alias("vals"))
        .select(
            "doc_id",
            "n_bigrams",
            (
                F.expr(
                    "aggregate(slice(vals, 2, size(vals) - 1), element_at(vals, 1), (acc, x) -> acc + x)"
                )
                / F.col("n_bigrams")
            ).alias("avg_p"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1]
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("ab_lm_join")
    t = Tables(spark, sf_dir)
    variants = ("default", "shj", "bcast")

    r0 = sorted(map(tuple, lm_score(t, "default").collect()))
    for v in variants[1:]:
        assert sorted(map(tuple, lm_score(t, v).collect())) == r0, f"{v} differs"
        drop_dead_blocks(spark)
    print(f"parity OK ({len(r0)} rows)")

    for v in variants:
        lm_score(t, v).write.format("noop").mode("overwrite").save()
        drop_dead_blocks(spark)
    samples: dict[str, list[float]] = {}
    for i in range(n_rounds):
        for v in variants:
            drop_dead_blocks(spark)
            spark.sparkContext.setJobDescription(f"lm:{v}:{i}")
            t0 = time.perf_counter()
            lm_score(t, v).write.format("noop").mode("overwrite").save()
            samples.setdefault(v, []).append(time.perf_counter() - t0)
    for v, ts in samples.items():
        print(f"{v:8s} min {min(ts):.3f}  median {statistics.median(ts):.3f}  all {[round(x,3) for x in ts]}")


if __name__ == "__main__":
    main()
