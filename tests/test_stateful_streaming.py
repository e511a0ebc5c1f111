"""applyInPandasWithState: state must accumulate across micro-batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_bridge_spark.catalog import normalize_event_ts
from data_bridge_spark.streaming.stateful import stream_user_totals


@pytest.fixture()
def two_batch_source(spark, sf_dir, tmp_path):
    """Split events into two parquet files so maxFilesPerTrigger=1 gives
    two genuine micro-batches."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "stream_src")
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/b0")
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/b1")
    # flatten the part files into one directory for the file source
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    i = 0
    for sub in ("b0", "b1"):
        for f in os.listdir(f"{src}/{sub}"):
            if f.endswith(".parquet"):
                os.rename(f"{src}/{sub}/{f}", f"{flat}/batch{i}.parquet")
                i += 1
    assert i == 2
    return flat


def test_state_accumulates_across_batches(spark, sf_dir, two_batch_source):
    schema = spark.read.parquet(two_batch_source).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(two_batch_source)
    )
    events = normalize_event_ts(raw, as_ntz=False)
    out = stream_user_totals(events)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    emitted = spark.sql("SELECT * FROM user_totals")
    # update mode re-emits a user on each batch it appears in; the final
    # (max) count per user must equal the batch ground truth
    final = emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value")
    )
    truth = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    f = {r.user_id: (r.n_events, r.total_value) for r in final.collect()}
    t = {r.user_id: (r.n, r.v) for r in truth.collect()}
    assert set(f) == set(t)
    for uid, (n, v) in t.items():
        assert f[uid][0] == n
        assert f[uid][1] == pytest.approx(v, rel=1e-9)
    # at least one user must have been emitted twice (state carried over)
    multi = emitted.groupBy("user_id").count().filter(F.col("count") >= 2).count()
    assert multi > 0


def test_stream_holt_state_equals_batch_fold_exactly(spark, sf_dir, tmp_path):
    """stream_holt across two TIME-ORDERED micro-batches must end with
    per-user (level, trend) EXACTLY equal (==, no tolerance) to the
    batch ts_holt fold over the same events — the stream==batch
    bit-equality contract of the sequential-fold family."""
    from data_bridge_spark.registry import load_all
    from data_bridge_spark.streaming.stateful import stream_holt

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_sorted = [r.ts for r in events.select("ts").orderBy("ts").collect()]
    cutoff = ts_sorted[len(ts_sorted) // 2]
    flat = str(tmp_path / "flat")
    os.makedirs(flat)

    def land(df, name):
        stage = str(tmp_path / ("s_" + name))
        df.coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(os.path.join(stage, part), os.path.join(flat, name + ".parquet"))

    land(events.filter(F.col("ts") <= cutoff), "batch0")
    land(events.filter(F.col("ts") > cutoff), "batch1")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    emitted = []

    def sink(batch_df, epoch_id):
        emitted.append((epoch_id, batch_df.collect()))

    q = (
        stream_holt(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(emitted) == 2  # two genuine micro-batches
    final = {}
    for _, rows in emitted:
        for r in rows:
            final[r.user_id] = (r.n_events, r.level, r.trend)

    batch = {
        r.user_id: (r.n_events, r.level, r.trend)
        for r in load_all()["ts_holt"].fn(spark, sf_dir).collect()
    }
    assert final == batch  # exact float equality, not approx
