"""Streaming fitted-stats twin: the incremental feature_standardize fit
must be BIT-identical to the batch fit on the same replayed data —
decimal-exact sums make the result independent of micro-batch
boundaries and arrival order."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_bridge_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    stream_feature_stats,
)


def test_stream_fit_stats_match_batch_exactly(spark, sf_dir):
    from data_bridge_spark.catalog import Tables
    from data_bridge_spark.functions.exact import dec, dec_to_double, dmoney

    stream = run_to_memory(
        stream_feature_stats(read_events_stream(spark, sf_dir)), mode="complete"
    )
    v = F.col("value")
    batch = Tables(spark, sf_dir).events.groupBy("event_type").agg(
        F.count("value").alias("n"),
        dec_to_double(F.sum(dec(v)), 6).alias("sx"),
        dec_to_double(F.sum(dmoney(v) * dmoney(v)), 8).alias("sxx"),
    )
    s = sorted(tuple(r) for r in stream.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert s == b  # bit-identical doubles, not approx
    assert len(s) >= 2
