"""Process-level crash robustness: SIGKILL the WHOLE driver process
mid-batch (after the upsert wrote, before the checkpoint committed) and
prove the restarted stream replays the batch to an exactly-once result.

The in-process crash test (test_streaming_restart.py) injects a Python
exception — the query dies but the JVM survives, so in-flight state can
be flushed gracefully. kill -9 is the real failure mode on a cluster
(OOM-killer, preemption, node loss): NOTHING gets to clean up. The
stream runner therefore executes in a SUBPROCESS that SIGKILLs itself at
the worst-case point; the parent restarts it from the same checkpoint and
asserts the serving table converged to the same rows a crash-free run
produces (deterministic replace-by-key upsert ⇒ duplicate application is
idempotent — data_bridge_spark/streaming/windows.py:stream_upsert_to_lake).
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

from pyspark.sql import functions as F

_RUNNER = textwrap.dedent(
    """
    import os, signal, sys

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    import data_bridge_spark.sinks.writers as writers
    from data_bridge_spark.streaming.windows import stream_upsert_to_lake

    landing, table, ckpt, kill_flag = sys.argv[1:5]

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("kill9-runner")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    if os.path.exists(kill_flag):
        real_upsert = writers.upsert_partitioned_table

        def kill_after_write(spark_, updates, path_, **kw):
            n = real_upsert(spark_, updates, path_, **kw)  # write COMPLETES
            os.remove(kill_flag)  # next run must NOT kill
            os.kill(os.getpid(), signal.SIGKILL)  # no cleanup, no commit

        writers.upsert_partitioned_table = kill_after_write

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
    print("RUNNER_DONE")
    """
)


def test_stream_upsert_survives_sigkill_mid_batch(spark, sf_dir, tmp_path):
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
    keys = [r.event_id for r in events.limit(3).collect()]

    landing = str(tmp_path / "changes")
    os.makedirs(landing)
    batch = (
        events.filter(F.col("event_id").isin(keys))
        .withColumn("value", F.lit(-9.0))
        .withColumn("ts", F.lit(1).cast("long"))
    )
    batch.coalesce(1).write.mode("append").parquet(landing)

    runner = tmp_path / "runner.py"
    runner.write_text(_RUNNER)
    kill_flag = tmp_path / "kill.flag"
    kill_flag.write_text("arm")
    ckpt = str(tmp_path / "ckpt")
    args = [sys.executable, str(runner), landing, table, ckpt, str(kill_flag)]

    # Run 1: SIGKILLs itself after the upsert write, before the
    # checkpoint commit — negative returncode == died by signal 9
    r1 = subprocess.run(args, capture_output=True, text=True, timeout=300)
    assert r1.returncode == -9, (r1.returncode, r1.stdout[-500:], r1.stderr[-800:])
    assert not kill_flag.exists(), "kill fired before the write completed"

    # Run 2: same checkpoint — the uncommitted batch REPLAYS and
    # re-applies idempotently; the runner drains and exits cleanly
    r2 = subprocess.run(args, capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, (r2.returncode, r2.stdout[-500:], r2.stderr[-800:])
    assert "RUNNER_DONE" in r2.stdout

    out = spark.read.parquet(table)
    assert out.count() == base_n  # no duplicate keys from double apply
    got = {
        r.event_id: r.value
        for r in out.filter(F.col("event_id").isin(keys)).collect()
    }
    assert got == {k: -9.0 for k in keys}


_LAKE_RUNNER = textwrap.dedent(
    """
    import sys, time

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    from data_bridge_spark.streaming.windows import stream_to_lake

    landing, table, ckpt = sys.argv[1:4]

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("kill9-lake-runner")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    schema = spark.read.parquet(landing).schema
    stream = spark.readStream.schema(schema).format("parquet").load(landing)

    # slow every task so the parent can SIGKILL mid-write: files on
    # disk, _spark_metadata commit still pending
    def slow(batches):
        time.sleep(5)
        yield from batches

    q = stream_to_lake(
        stream.repartition(4).mapInPandas(slow, schema),
        table, ckpt, partition_cols=["event_type"],
    )
    q.processAllAvailable()
    q.stop()
    print("RUNNER_DONE")
    """
)


def test_stream_to_lake_survives_sigkill_mid_write(spark, sf_dir, tmp_path):
    """kill -9 the driver while the file sink is mid-write (tasks slowed
    to hold the window open), then restart from the checkpoint: the
    parquet sink's _spark_metadata transaction log must make the replay
    exactly-once — a reader sees each input row exactly once even though
    orphaned uncommitted part-files from the killed attempt may remain
    on disk."""
    import time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type", "value")
        .limit(400)
    )
    landing = str(tmp_path / "landing")
    events.coalesce(1).write.mode("append").parquet(landing)
    expect_n = spark.read.parquet(landing).count()

    table = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    runner = tmp_path / "runner_lake.py"
    runner.write_text(_LAKE_RUNNER)
    args = [sys.executable, str(runner), landing, table, ckpt]

    # Run 1: give the slowed batch time to start writing, then SIGKILL
    # the whole process tree's python driver (JVM follows via stdin EOF)
    p = subprocess.Popen(args, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    deadline = time.time() + 120
    while time.time() < deadline and not os.path.isdir(table):
        time.sleep(0.5)  # wait for the sink to create the output dir
    # fail loudly if the sink never started: killing before any write
    # would silently degrade this to a kill-before-write test and skip
    # the mid-write replay path this test exists to exercise
    assert os.path.isdir(table), "sink never created output dir within 120s"
    time.sleep(6)  # inside the 4 x 5s slowed write, commit pending
    p.kill()
    p.wait(timeout=60)
    assert p.returncode == -9

    # the kill must have landed BEFORE the batch committed
    commits = os.path.join(ckpt, "commits")
    assert not os.path.isdir(commits) or not [
        f for f in os.listdir(commits) if not f.startswith(".")
    ], "kill landed after commit — widen the slow window"

    # Run 2: restart from the same checkpoint, drain to completion
    r2 = subprocess.run(args, capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, (r2.returncode, r2.stderr[-800:])
    assert "RUNNER_DONE" in r2.stdout

    # exactly-once: the committed view has each row exactly once
    out = spark.read.parquet(table)
    assert out.count() == expect_n
    assert out.select("event_id").distinct().count() == expect_n


_STATE_RUNNER = textwrap.dedent(
    """
    import sys, time

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    from data_bridge_spark.streaming.stateful import stream_user_totals

    landing, outdir, ckpt = sys.argv[1:4]

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("kill9-state-runner")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    schema = spark.read.parquet(landing).schema
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", "1").load(landing)
    )

    # slow every micro-batch so the parent can SIGKILL between the state
    # store's in-memory update and the checkpoint commit
    def slow(batches):
        time.sleep(3)
        yield from batches

    slowed = stream.mapInPandas(slow, schema)

    def sink(batch_df, epoch_id):
        # per-epoch overwrite: a replayed (uncommitted) batch keeps its
        # batch id, so the replay idempotently rewrites its own dir
        batch_df.write.mode("overwrite").parquet(f"{outdir}/epoch={epoch_id}")

    q = (
        stream_user_totals(slowed)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    print("RUNNER_DONE")
    """
)


def test_stateful_totals_survive_sigkill_mid_batch(spark, sf_dir, tmp_path):
    """kill -9 the driver while the applyInPandasWithState lane is
    mid-batch (state updated in memory, checkpoint commit pending), then
    restart from the checkpoint: the HDFS-backed state store must replay
    the uncommitted batch without double-counting — the final per-user
    totals equal the crash-free truth exactly. Completes the crash
    matrix: the lake sinks have SIGKILL coverage above; this is the
    STATE-STORE lane (custom stateful operator, SURVEY §2 streaming)."""
    import time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # ts deliberately excluded: the state lane keys on user_id and folds
    # value only, and the slowed mapInPandas pass-through must not carry
    # a nanos timestamp through pandas (see retry_sweep's mapInArrow note)
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "value")
        .limit(1200)
    )
    landing = str(tmp_path / "landing")
    for i in range(6):  # 6 chunk files -> 6 micro-batches at 1 file/trigger
        events.filter(F.col("event_id") % 6 == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    staged = spark.read.parquet(landing)
    truth = {
        r.user_id: (r.n, float(r.s))
        for r in staged.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }

    outdir = str(tmp_path / "totals")
    ckpt = str(tmp_path / "ckpt")
    runner = tmp_path / "runner_state.py"
    runner.write_text(_STATE_RUNNER)
    args = [sys.executable, str(runner), landing, outdir, ckpt]

    # Run 1: let at least one batch commit, then SIGKILL inside a later
    # slowed batch (state updated, commit pending)
    p = subprocess.Popen(args, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    deadline = time.time() + 120
    while time.time() < deadline and not os.path.isdir(outdir):
        time.sleep(0.5)
    assert os.path.isdir(outdir), "state sink never produced output within 120s"
    time.sleep(4)  # into the next 3s-slowed batch
    p.kill()
    p.wait(timeout=60)
    assert p.returncode == -9

    commits = os.path.join(ckpt, "commits")
    n_committed = (
        len([f for f in os.listdir(commits) if not f.startswith(".")])
        if os.path.isdir(commits)
        else 0
    )
    assert n_committed < 6, "kill landed after full drain — widen the slow window"

    # Run 2: restart from the same checkpoint, drain the remaining batches
    r2 = subprocess.run(args, capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, (r2.returncode, r2.stderr[-800:])
    assert "RUNNER_DONE" in r2.stdout

    # converged state: the LATEST emission per user equals the crash-free
    # truth — no double count from the replayed batch, no lost state
    import glob as _glob

    latest: dict[int, tuple[int, int, float]] = {}
    for d in _glob.glob(os.path.join(outdir, "epoch=*")):
        epoch = int(d.rsplit("=", 1)[1])
        for r in spark.read.parquet(d).collect():
            if r.user_id not in latest or latest[r.user_id][0] < epoch:
                latest[r.user_id] = (epoch, r.n_events, float(r.total_value))
    assert set(latest) == set(truth), "user set diverged"
    for uid, (n, s) in truth.items():
        got_n, got_s = latest[uid][1], latest[uid][2]
        assert got_n == n, f"user {uid}: n_events {got_n} != {n} (double/lost count)"
        assert abs(got_s - s) <= 1e-6 * max(1.0, abs(s)), f"user {uid}: total {got_s} != {s}"
