"""Stream-stream join must agree with the identical batch join."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_bridge_spark.streaming.joins import stream_click_to_purchase
from data_bridge_spark.streaming.windows import read_events_stream, run_to_memory


def _batch_events(spark, sf_dir):
    from data_bridge_spark.catalog import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"), as_ntz=False)


def test_stream_stream_join_matches_batch(spark, sf_dir):
    streamed = run_to_memory(
        stream_click_to_purchase(read_events_stream(spark, sf_dir))
    )
    batch = stream_click_to_purchase(_batch_events(spark, sf_dir))
    s = {(r.purchase_id, r.click_id) for r in streamed.collect()}
    b = {(r.purchase_id, r.click_id) for r in batch.collect()}
    assert s == b
    assert len(s) > 0


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    from data_bridge_spark.streaming.joins import stream_enrich_users

    dim = (
        _batch_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.when(F.col("n") >= 20, "heavy").otherwise("light").alias("user_tier"),
        )
    )
    dim.cache().count()  # static side fixed for both runs
    streamed = run_to_memory(
        stream_enrich_users(read_events_stream(spark, sf_dir), dim)
    )
    batch = stream_enrich_users(_batch_events(spark, sf_dir), dim)
    s = {(r.event_id, r.user_tier) for r in streamed.collect()}
    b = {(r.event_id, r.user_tier) for r in batch.collect()}
    assert s == b and len(s) > 0
