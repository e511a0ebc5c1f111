"""Custom Python DataSource: partitioned, deterministic, planner-visible."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_bridge_spark.sources.python_datasource import make_doc, register_synthdocs


def test_synthdocs_partitioned_read(spark):
    register_synthdocs(spark)
    df = (
        spark.read.format("synthdocs")
        .option("rows", "500")
        .option("partitions", "8")
        .option("seed", "7")
        .load()
    )
    assert df.columns == ["doc_id", "text", "lang", "n_chars"]
    assert df.count() == 500
    assert df.select("doc_id").distinct().count() == 500
    assert df.rdd.getNumPartitions() == 8
    # deterministic: executor-produced rows match driver-side generation
    sample = {r.doc_id: (r.text, r.lang) for r in df.filter(F.col("doc_id") < 5).collect()}
    for doc_id, (text, lang) in sample.items():
        _, t, lg, _ = make_doc(doc_id, 7)
        assert (t, lg) == (text, lang)


def test_synthdocs_composes_with_operators(spark):
    register_synthdocs(spark)
    df = spark.read.format("synthdocs").option("rows", "200").load()
    stats = (
        df.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .count()
        .orderBy(F.col("count").desc())
    )
    assert stats.count() > 10  # vocabulary flowed through explode+agg
