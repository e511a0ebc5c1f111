"""Interleaved A/B: dedup_verified_pairs — fence the words table?

The verify stage consumes `words` twice (a- and b-side of the candidate
join); unfenced, the documents scan + split + array_distinct runs
twice. Fencing it (lineage_cut) materializes the token arrays once but
pays block storage for fat array rows. Measure, don't guess.

Usage: python tools/ab_verified_words.py <sf_dir> [n_rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_bridge_spark.catalog import Tables
from data_bridge_spark.operators.dedup import lsh_candidate_pairs
from data_bridge_spark.session import drop_dead_blocks, get_spark, lineage_cut


def verified(t: Tables, fence_words: bool):
    docs = t.documents
    words = docs.select(
        "doc_id", F.array_distinct(F.split(F.lower(F.col("text")), " ")).alias("words")
    )
    if fence_words:
        words = lineage_cut(words)
    pairs = lsh_candidate_pairs(docs)
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
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("ab_verified_words")
    t = Tables(spark, sf_dir)

    r0 = sorted(map(tuple, verified(t, False).collect()))
    r1 = sorted(map(tuple, verified(t, True).collect()))
    assert r0 == r1, "fence changed results"
    drop_dead_blocks(spark)
    print(f"parity OK ({len(r0)} rows)")

    for fw in (False, True):
        verified(t, fw).write.format("noop").mode("overwrite").save()
        drop_dead_blocks(spark)
    samples: dict[bool, list[float]] = {}
    for i in range(n_rounds):
        for fw in (False, True):
            drop_dead_blocks(spark)
            spark.sparkContext.setJobDescription(f"verified:fence_words={fw}:{i}")
            t0 = time.perf_counter()
            verified(t, fw).write.format("noop").mode("overwrite").save()
            samples.setdefault(fw, []).append(time.perf_counter() - t0)
    for fw, ts in samples.items():
        print(
            f"fence_words={fw!s:5s} min {min(ts):.3f}  median {statistics.median(ts):.3f}  "
            f"all {[round(x, 3) for x in ts]}"
        )


if __name__ == "__main__":
    main()
