"""Checkpoint-restart: streaming state must survive a query restart.

Run 1 processes the first half of events and stops. Run 2 starts from the
same checkpoint after the second half lands — it must read ONLY the new
file (offset log) and its emitted totals must include run-1 state
(state store recovery)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from data_bridge_spark.catalog import normalize_event_ts
from data_bridge_spark.streaming.stateful import stream_user_totals


def _write_half(spark, sf_dir, flat, which):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    half = events.filter((F.col("event_id") % 2 == 0) == (which == 0))
    tmp = flat + f"_stage{which}"
    half.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(flat, exist_ok=True)
    shutil.move(os.path.join(tmp, part), os.path.join(flat, f"half{which}.parquet"))


def _run_once(spark, flat, ckpt, name):
    # memory sink can't recover from a checkpoint; foreachBatch can
    raw = (
        spark.readStream.schema(spark.read.parquet(flat).schema)
        .format("parquet")
        .load(flat)
    )
    events = normalize_event_ts(raw, as_ntz=False)
    emitted: list = []

    def sink(batch_df, epoch_id):
        emitted.extend(batch_df.collect())

    q = (
        stream_user_totals(events)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return emitted


def test_state_survives_restart(spark, sf_dir, tmp_path):
    flat = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")

    _write_half(spark, sf_dir, flat, 0)
    run1 = _run_once(spark, flat, ckpt, "totals_run1")
    assert len(run1) > 0

    _write_half(spark, sf_dir, flat, 1)
    run2 = _run_once(spark, flat, ckpt, "totals_run2")

    # run 2 only emits users present in the NEW file (offsets recovered,
    # old file not reprocessed)...
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    half1_users = {
        r.user_id
        for r in spark.read.parquet(os.path.join(flat, "half1.parquet"))
        .select("user_id")
        .distinct()
        .collect()
    }
    assert {r.user_id for r in run2} == half1_users

    # ...but its totals include run-1 state: final counts equal full truth
    truth = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in run2:
        assert r.n_events == truth[r.user_id], f"user {r.user_id} lost state on restart"


def test_lake_sink_exactly_once_across_restart(spark, sf_dir, tmp_path):
    """Streaming parquet lake sink: run 1 drains half the events into a
    partitioned layout, run 2 (same checkpoint) drains only the newly
    landed half — total rows exactly match the source, no duplicates,
    and the layout partition-prunes."""
    from data_bridge_spark.streaming.windows import stream_to_lake

    flat = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    lake = str(tmp_path / "lake")

    def run_once():
        raw = (
            spark.readStream.schema(spark.read.parquet(flat).schema)
            .format("parquet")
            .load(flat)
        )
        events = normalize_event_ts(raw, as_ntz=False)
        q = stream_to_lake(events, lake, ckpt, partition_cols=["event_type"])
        q.processAllAvailable()
        q.stop()

    _write_half(spark, sf_dir, flat, 0)
    run_once()
    n_first = spark.read.parquet(lake).count()
    _write_half(spark, sf_dir, flat, 1)
    run_once()

    out = spark.read.parquet(lake)
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert n_first < out.count() == src.count()
    assert out.select("event_id").distinct().count() == src.count()
    # layout prunes
    one_type = out.filter(F.col("event_type") == out.select("event_type").first()[0])
    from tests.conftest import plan_string

    assert "PartitionFilters" in plan_string(one_type)


def test_stream_upsert_applies_latest_per_key(spark, sf_dir, tmp_path):
    """stream_upsert_to_lake: a change stream merges into the partitioned
    serving table — updated keys replaced (latest ts wins inside a
    batch), unmatched rows kept, second run from the same checkpoint
    reads only the new file and stays idempotent on row count."""
    from data_bridge_spark.streaming.windows import stream_upsert_to_lake
    from data_bridge_spark.sinks.writers import write_partitioned_table

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type", "value")
        .withColumn("ts", F.lit(0).cast("long"))
    )
    table = str(tmp_path / "serving")
    write_partitioned_table(events, table, partition_cols=["event_type"])
    base_n = events.count()

    landing = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing, exist_ok=True)

    def land(batch_df, name):
        stage = str(tmp_path / ("stage_" + name))
        batch_df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        shutil.move(os.path.join(stage, part), os.path.join(landing, name + ".parquet"))

    def run():
        stream = (
            spark.readStream.schema(spark.read.parquet(landing).schema)
            .format("parquet")
            .load(landing)
        )
        q = stream_upsert_to_lake(
            stream, table, ckpt, partition_cols=["event_type"], key_cols=["event_id"]
        )
        q.processAllAvailable()
        q.stop()

    keys = [r.event_id for r in events.limit(3).collect()]
    # batch 1: two versions of the same keys — ts=2 must win over ts=1
    v1 = events.filter(F.col("event_id").isin(keys)).withColumn(
        "value", F.lit(-1.0)
    ).withColumn("ts", F.lit(1).cast("long"))
    v2 = events.filter(F.col("event_id").isin(keys)).withColumn(
        "value", F.lit(-2.0)
    ).withColumn("ts", F.lit(2).cast("long"))
    land(v1.unionByName(v2), "batch1")
    run()

    after = spark.read.parquet(table)
    assert after.count() == base_n
    got = {r.event_id: r.value for r in after.filter(F.col("event_id").isin(keys)).collect()}
    assert got == {k: -2.0 for k in keys}

    # batch 2 from the same checkpoint: only the new file is read
    land(
        events.filter(F.col("event_id").isin(keys[:1]))
        .withColumn("value", F.lit(-3.0))
        .withColumn("ts", F.lit(3).cast("long")),
        "batch2",
    )
    run()
    after2 = spark.read.parquet(table)
    assert after2.count() == base_n
    assert after2.filter(F.col("event_id") == keys[0]).collect()[0].value == -3.0


def test_stream_upsert_equal_ts_tie_is_deterministic(spark, sf_dir, tmp_path):
    """Two change rows for the same key with EQUAL ts: the documented tie
    rule (remaining columns compared descending) must pick the same
    winner on every apply — including a full replay into a fresh table
    from a fresh checkpoint (the idempotence contract on checkpoint
    replay)."""
    from data_bridge_spark.sinks.writers import write_partitioned_table
    from data_bridge_spark.streaming.windows import stream_upsert_to_lake

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type", "value")
        .withColumn("ts", F.lit(0).cast("long"))
    )
    key = events.select("event_id").first()[0]

    landing = str(tmp_path / "changes")
    os.makedirs(landing, exist_ok=True)
    tied = (
        events.filter(F.col("event_id") == key).withColumn("value", F.lit(-7.0))
        .unionByName(
            events.filter(F.col("event_id") == key).withColumn("value", F.lit(-9.0))
        )
        .withColumn("ts", F.lit(5).cast("long"))
    )
    stage = str(tmp_path / "stage")
    tied.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    shutil.move(os.path.join(stage, part), os.path.join(landing, "tied.parquet"))

    def apply_once(tag: str) -> float:
        table = str(tmp_path / f"serving_{tag}")
        write_partitioned_table(events, table, partition_cols=["event_type"])
        stream = (
            spark.readStream.schema(spark.read.parquet(landing).schema)
            .format("parquet")
            .load(landing)
        )
        q = stream_upsert_to_lake(
            stream, table, str(tmp_path / f"ckpt_{tag}"),
            partition_cols=["event_type"], key_cols=["event_id"],
        )
        q.processAllAvailable()
        q.stop()
        return spark.read.parquet(table).filter(F.col("event_id") == key).collect()[0].value

    first = apply_once("a")
    replay = apply_once("b")
    # value is the only non-(key, ts) column: descending tiebreak → -7.0
    assert first == replay == -7.0


def test_stream_upsert_tiebreak_skips_unorderable_map_column(spark, sf_dir, tmp_path):
    """A change stream carrying a map-typed column (events.props) must not
    blow up the equal-ts tiebreak: maps are not orderable in Spark, so
    the tiebreak is restricted to orderable columns in sorted-name order
    (and stays deterministic regardless of batch column order)."""
    from data_bridge_spark.sinks.writers import write_partitioned_table
    from data_bridge_spark.streaming.windows import stream_upsert_to_lake

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type", "value", "props")
        .withColumn("ts", F.lit(0).cast("long"))
    )
    key = events.select("event_id").first()[0]
    table = str(tmp_path / "serving")
    write_partitioned_table(events, table, partition_cols=["event_type"])

    landing = str(tmp_path / "changes")
    os.makedirs(landing, exist_ok=True)
    tied = (
        events.filter(F.col("event_id") == key).withColumn("value", F.lit(-7.0))
        .unionByName(
            events.filter(F.col("event_id") == key).withColumn("value", F.lit(-9.0))
        )
        .withColumn("ts", F.lit(5).cast("long"))
    )
    stage = str(tmp_path / "stage")
    tied.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    shutil.move(os.path.join(stage, part), os.path.join(landing, "tied.parquet"))

    stream = (
        spark.readStream.schema(spark.read.parquet(landing).schema)
        .format("parquet")
        .load(landing)
    )
    q = stream_upsert_to_lake(
        stream, table, str(tmp_path / "ckpt"),
        partition_cols=["event_type"], key_cols=["event_id"],
    )
    q.processAllAvailable()
    q.stop()
    row = spark.read.parquet(table).filter(F.col("event_id") == key).collect()[0]
    # value is the highest orderable non-(key, ts) column: descending → -7.0
    assert row.value == -7.0


def test_stream_upsert_crash_mid_batch_recovers_exactly_once(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash INSIDE foreachBatch after the upsert wrote but before the
    checkpoint committed — the worst-case failure window. On restart the
    batch replays and re-applies; because the upsert is a deterministic
    replace-by-key, the double application converges to the same table:
    exactly-once APPLICATION, proven by value equality and row count."""
    import data_bridge_spark.sinks.writers as writers
    from data_bridge_spark.sinks.writers import write_partitioned_table
    from data_bridge_spark.streaming.windows import stream_upsert_to_lake

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type", "value")
        .withColumn("ts", F.lit(0).cast("long"))
    )
    table = str(tmp_path / "serving")
    write_partitioned_table(events, table, partition_cols=["event_type"])
    base_n = events.count()
    keys = [r.event_id for r in events.limit(3).collect()]

    landing = str(tmp_path / "changes")
    os.makedirs(landing, exist_ok=True)
    batch = (
        events.filter(F.col("event_id").isin(keys))
        .withColumn("value", F.lit(-5.0))
        .withColumn("ts", F.lit(1).cast("long"))
    )
    stage = str(tmp_path / "stage")
    batch.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    shutil.move(os.path.join(stage, part), os.path.join(landing, "b1.parquet"))

    real_upsert = writers.upsert_partitioned_table
    calls = {"n": 0}

    def crashing(spark_, updates, path_, **kw):
        n = real_upsert(spark_, updates, path_, **kw)  # write COMPLETES
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash after write, before checkpoint commit")
        return n

    monkeypatch.setattr(writers, "upsert_partitioned_table", crashing)
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(spark.read.parquet(landing).schema)
            .format("parquet")
            .load(landing)
        )
        q = stream_upsert_to_lake(
            stream, table, ckpt, partition_cols=["event_type"], key_cols=["event_id"]
        )
        try:
            q.processAllAvailable()
        except Exception:
            pass  # first run: the injected crash fails the query
        finally:
            try:
                q.stop()
            except Exception:
                pass

    run()  # crashes after the write — batch applied, checkpoint uncommitted
    assert calls["n"] == 1
    # second run from the same checkpoint: the batch REPLAYS (it never
    # committed) and re-applies idempotently
    run()
    assert calls["n"] == 2
    after = spark.read.parquet(table)
    assert after.count() == base_n  # no duplicates from the double apply
    got = {
        r.event_id: r.value
        for r in after.filter(F.col("event_id").isin(keys)).collect()
    }
    assert got == {k: -5.0 for k in keys}
