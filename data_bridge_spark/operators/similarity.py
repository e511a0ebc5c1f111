"""Similarity search over embedding vectors (SURVEY.md §2C3).

Two paths, as a 100 TB design requires:

- **brute-force top-k** (`sim_topk`): probe × candidate join, JVM-side
  cosine, per-probe rank. Correct baseline; cost O(P·N) — fine when the
  probe set is small and N is sharded across executors.
- **LSH-bucketed** (`sim_topk_lsh`): random-hyperplane-style signature
  (sign pattern of leading dimensions), equi-join probes to candidates in
  the same bucket only. The join becomes a hash-partitioned equi-join on
  the bucket key — the shuffle-friendly shape that survives 1000×
  scale-up; recall trades off with bucket width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_bridge_spark.catalog import Tables
from data_bridge_spark.functions.vectors import cosine_similarity
from data_bridge_spark.registry import register

_COS_SQL = """
    list_aggregate(list_transform(list_zip(p.embedding, c.embedding),
        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
    / (SQRT(list_aggregate(list_transform(p.embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
       * SQRT(list_aggregate(list_transform(c.embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
"""


@register(
    "sim_topk",
    oracle=f"""
    SELECT probe_id, cand_id, cos_sim, rk FROM (
        SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
               {_COS_SQL} AS cos_sim,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY {_COS_SQL} DESC, c.vec_id ASC
               ) AS INTEGER) AS rk
        FROM embeddings p JOIN embeddings c ON p.vec_id <> c.vec_id
        WHERE p.vec_id < 10
    ) WHERE rk <= 5
    """,
    tags=("similarity", "topk"),
)
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: 10 probe vectors against all candidates,
    keep 5 nearest each. The candidate side stays partitioned; probes are
    broadcast; ranking shuffles only (probe, cand, score) triples."""
    t = Tables(spark, sf_dir)
    probes = t.embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb")
    )
    cands = t.embeddings.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb"))
    scored = (
        cands.join(F.broadcast(probes), F.col("probe_id") != F.col("cand_id"))
        .select(
            "probe_id",
            "cand_id",
            cosine_similarity(F.col("p_emb"), F.col("c_emb")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)


_SIG_DIMS = 6  # sign bits of the first 6 dimensions → 64 buckets


def _bucket_expr(emb: F.Column) -> F.Column:
    bits = [
        F.when(F.element_at(emb, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(_SIG_DIMS)
    ]
    return F.concat(*bits)


_BUCKET_SQL = (
    "list_aggregate(list_transform(embedding[1:6], "
    "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), 'string_agg', '')"
)


@register(
    "sim_ivf",
    oracle=None,  # multi-stage ANN with centroid float means → rows-only
    tags=("similarity", "topk", "ivf"),
)
def sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: partition vectors into coarse cells, search a probe
    only against its nearest cell's members.

    Cells here are the embedding's label groups with mean-vector
    centroids (a k-means assignment would drop in identically — the label
    column gives a deterministic stand-in without an iterative trainer).
    Plan shape: tiny centroid table (broadcast) → probe-to-cell
    assignment → equi-join on cell id → local top-k. The expensive
    probe×all cross join never happens; the equi-join on cell shuffles
    hash-partitioned, which is what scales.
    """
    t = Tables(spark, sf_dir)
    emb = t.embeddings
    dim = 64
    # centroid per label: elementwise mean, decimal-summed for determinism
    sums = emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.element_at("embedding", i + 1).cast("decimal(18,10)")).alias(f"s{i}")
            for i in range(dim)
        ],
    )
    centroids = sums.select(
        "label",
        F.array(
            *[(F.col(f"s{i}").cast("double") / F.col("n")) for i in range(dim)]
        ).alias("centroid"),
    )
    probes = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb")
    )
    # assign each probe to its nearest centroid (tiny cross: 20 x 10)
    assigned = (
        probes.join(F.broadcast(centroids))
        .select(
            "probe_id",
            "p_emb",
            "label",
            cosine_similarity(F.col("p_emb"), F.col("centroid")).alias("c_sim"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("probe_id").orderBy(F.col("c_sim").desc(), F.col("label").asc())
            ),
        )
        .filter(F.col("rk") == 1)
        .select("probe_id", "p_emb", F.col("label").alias("cell"))
    )
    cands = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb"), F.col("label").alias("cell")
    )
    scored = assigned.join(cands, "cell").filter(F.col("probe_id") != F.col("cand_id")).select(
        "probe_id",
        "cand_id",
        cosine_similarity(F.col("p_emb"), F.col("c_emb")).alias("cos_sim"),
    )
    w = W.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)


@register(
    "sim_topk_lsh",
    oracle=f"""
    WITH sig AS (
        SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket
        FROM embeddings
    )
    SELECT probe_id, cand_id, cos_sim, rk FROM (
        SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
               {_COS_SQL} AS cos_sim,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY {_COS_SQL} DESC, c.vec_id ASC
               ) AS INTEGER) AS rk
        FROM sig p JOIN sig c ON p.bucket = c.bucket AND p.vec_id <> c.vec_id
        WHERE p.vec_id < 50
    ) WHERE rk <= 3
    """,
    tags=("similarity", "topk", "lsh"),
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via sign-pattern LSH: bucket = sign bits of the leading
    dimensions (a fixed random-hyperplane projection), candidates searched
    within the probe's bucket only. Plan shape = equi-join on bucket →
    hash-partitionable; recall < 1 by design, but the result is still
    deterministic so it oracle-checks."""
    t = Tables(spark, sf_dir)
    sig = t.embeddings.select(
        "vec_id", "embedding", _bucket_expr(F.col("embedding")).alias("bucket")
    )
    probes = sig.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p_emb"),
        F.col("bucket").alias("p_bucket"),
    )
    cands = sig.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        F.col("bucket").alias("c_bucket"),
    )
    scored = (
        cands.join(
            F.broadcast(probes),
            (F.col("p_bucket") == F.col("c_bucket")) & (F.col("probe_id") != F.col("cand_id")),
        )
        .select(
            "probe_id",
            "cand_id",
            cosine_similarity(F.col("p_emb"), F.col("c_emb")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
