"""Interleaved in-process A/B: lsh_candidate_pairs small-bucket lane,
self-join (r11) vs per-bucket regroup (r12).

The r12 regroup was kept on an at-scale argument (two removed sorts +
one removed pair-stream exchange) while the driver's cold-JVM bench
measured dedup_minhash_pairs 0.66x / dedup_verified_pairs 0.75x — the
round's two worst numbers. This tool settles it the way the r12 doc
settled stats_mannwhitney: both variants in ONE process, alternating
samples, min-of-N, noop sink, cache dropped between samples — at any
SF dir (sf0.1 and the synthesized sf1 decade).

Usage: python tools/ab_lsh_pairs.py <sf_dir> [n_rounds]
Prints per-variant min/median for dedup_minhash_pairs-shaped and
dedup_verified_pairs-shaped plans, plus a result-parity assertion.
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
from data_bridge_spark.operators.dedup import _BUCKET_CAP, _bands_long
from data_bridge_spark.session import drop_dead_blocks, get_spark, plan_once


def candidate_pairs(docs: DataFrame, variant: str, cap: int = _BUCKET_CAP) -> DataFrame:
    """lsh_candidate_pairs with the small-bucket lane switched by name."""
    w = Window.partitionBy("band_idx", "band_hash")
    sized = (
        _bands_long(docs)
        .select(
            "doc_id",
            "band_idx",
            "band_hash",
            F.count(F.lit(1)).over(w).alias("bsz"),
            F.min("doc_id").over(w).alias("bmin"),
        )
        .transform(plan_once)
    )
    small = sized.filter(F.col("bsz") <= cap)
    if variant == "regroup":
        members = small.groupBy("band_idx", "band_hash").agg(
            F.array_sort(F.collect_list("doc_id")).alias("ids")
        )
        pairs_small = members.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (a, i) ->"
                    " transform(slice(ids, i + 2, size(ids)),"
                    " b -> struct(a AS id_a, b AS id_b))))"
                )
            ).alias("p")
        ).select("p.id_a", "p.id_b")
    elif variant == "selfjoin":
        l = small.select("band_idx", "band_hash", F.col("doc_id").alias("id_a"))
        r = small.select("band_idx", "band_hash", F.col("doc_id").alias("id_b"))
        pairs_small = l.join(
            r, on=["band_idx", "band_hash"], how="inner"
        ).filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    else:
        raise ValueError(variant)
    pairs_star = sized.filter(
        (F.col("bsz") > cap) & (F.col("doc_id") != F.col("bmin"))
    ).select(F.col("bmin").alias("id_a"), F.col("doc_id").alias("id_b"))
    return pairs_small.unionByName(pairs_star).distinct()


def verified(docs: DataFrame, variant: str) -> DataFrame:
    """dedup_verified_pairs composition over the chosen pair lane."""
    words = docs.select(
        "doc_id", F.array_distinct(F.split(F.lower(F.col("text")), " ")).alias("words")
    )
    pairs = candidate_pairs(docs, variant)
    a = words.select(F.col("doc_id").alias("id_a"), F.col("words").alias("words_a"))
    b = words.select(F.col("doc_id").alias("id_b"), F.col("words").alias("words_b"))
    inter = F.size(F.array_intersect(F.col("words_a"), F.col("words_b")))
    union = F.size(F.array_union(F.col("words_a"), F.col("words_b")))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", (inter.cast("double") / union).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


def main() -> None:
    sf_dir = sys.argv[1]
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab_lsh_pairs")
    docs = Tables(spark, sf_dir).documents

    # parity first: identical pair sets (cheap relative to the timings)
    a = candidate_pairs(docs, "regroup")
    b = candidate_pairs(docs, "selfjoin")
    n_a = a.count()
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    drop_dead_blocks(spark)
    assert diff == 0, f"variants disagree: symmetric diff {diff}"
    print(f"parity OK: {n_a} pairs, symmetric diff 0")

    shapes = {"pairs": candidate_pairs, "verified": verified}
    samples: dict[tuple[str, str], list[float]] = {}
    # warmup both variants once (codegen)
    for shape, fn in shapes.items():
        for variant in ("regroup", "selfjoin"):
            fn(docs, variant).write.format("noop").mode("overwrite").save()
            drop_dead_blocks(spark)
    for i in range(n_rounds):
        for shape, fn in shapes.items():
            for variant in ("regroup", "selfjoin"):
                drop_dead_blocks(spark)
                spark.sparkContext.setJobDescription(f"{shape}:{variant}:{i}")
                t0 = time.perf_counter()
                fn(docs, variant).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                samples.setdefault((shape, variant), []).append(dt)
    for (shape, variant), ts in sorted(samples.items()):
        print(
            f"{shape:9s} {variant:9s} min {min(ts):.3f}  median {statistics.median(ts):.3f}  "
            f"all {[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
