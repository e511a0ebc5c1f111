"""Streaming throughput bench — the r5 verdict's missing perf row.

Measures sustained rows/s and state-store footprint for the three
stateful streaming lanes on an sf0.1 events replay:

- stream_tumbling_counts  (watermarked windowed agg -> noop sink)
- stream_holt             (applyInPandasWithState per-key fold -> noop)
- stream_upsert_to_lake   (foreachBatch CDC apply into a partitioned lake)

Replay: the sf0.1 events table staged as R replicas x C chunk files
(replica r shifts event_id/user_id by r*10^7 / r*10^5 so keys are
distinct — upsert sees real inserts, holt sees R x key breadth);
maxFilesPerTrigger bounds each micro-batch, availableNow drains the
backlog. Throughput = input rows / drain wall-clock (micro-batch
overheads included — that IS the sustained number); state rows/bytes
from the query's recentProgress stateOperators.

Prints one JSON line; paste the numbers into SCALE.md's streaming row.

Usage: python tools/stream_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 5
CHUNKS = 10
FILES_PER_TRIGGER = 5


def stage_replay(spark, sf_dir: str, staging: str) -> int:
    """R key-shifted replicas of events, C parquet chunk files each."""
    from pyspark.sql import functions as F

    from data_bridge_spark.catalog import Tables

    events = Tables(spark, sf_dir).events
    if os.path.isdir(staging):
        shutil.rmtree(staging)
    total = 0
    for r in range(REPLICAS):
        shifted = events.select(
            (F.col("event_id") + r * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + r * 100_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        shifted.repartition(CHUNKS).write.mode("append").parquet(staging)
        total += shifted.count()
    return total


def drain(q) -> dict:
    q.awaitTermination()
    state = {"rows": 0, "bytes": 0}
    batches = 0
    for p in q.recentProgress:
        batches += 1
        for so in p.get("stateOperators") or []:
            state["rows"] = max(state["rows"], so.get("numRowsTotal", 0))
            state["bytes"] = max(state["bytes"], so.get("memoryUsedBytes", 0))
    state["micro_batches"] = batches
    return state


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from data_bridge_spark.session import get_spark
    from data_bridge_spark.streaming.stateful import stream_holt
    from data_bridge_spark.streaming.windows import (
        stream_dedup,
        stream_tumbling_counts,
        stream_upsert_to_lake,
    )
    from data_bridge_spark.catalog import normalize_event_ts
    from data_bridge_spark.sinks.writers import write_partitioned_table

    spark = get_spark("stream_bench")
    # drain() aggregates over q.recentProgress, which Spark caps at
    # numRecentProgressUpdates (default 100): a long drain would
    # undercount micro_batches and could miss the state peak if state
    # shrinks late. Raise the cap well past any drain length here
    # (replay is REPLICAS*CHUNKS files / FILES_PER_TRIGGER per batch).
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale")
    staging = os.path.join(root, "stream_events")
    work = os.path.join(root, "stream_bench_work")
    if os.path.isdir(work):
        shutil.rmtree(work)
    os.makedirs(work)

    n_rows = stage_replay(spark, sf_dir, staging)
    schema = spark.read.parquet(staging).schema

    def source():
        raw = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
            .load(staging)
        )
        return normalize_event_ts(raw, as_ntz=False)

    results: dict[str, dict] = {}

    def run(name, make_query):
        t0 = time.perf_counter()
        q = make_query()
        stats = drain(q)
        q.stop()
        wall = time.perf_counter() - t0
        results[name] = {
            "rows_in": n_rows,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n_rows / wall),
            **stats,
        }
        print(name, results[name], file=sys.stderr)

    run(
        "stream_tumbling_counts",
        lambda: stream_tumbling_counts(source())
        .writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", os.path.join(work, "ckpt_tumbling"))
        .trigger(availableNow=True)
        .start(),
    )
    run(
        "stream_dedup_exact",
        lambda: stream_dedup(source())
        .writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", os.path.join(work, "ckpt_dedup"))
        .trigger(availableNow=True)
        .start(),
    )
    run(
        "stream_holt",
        lambda: stream_holt(source())
        .writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", os.path.join(work, "ckpt_holt"))
        .trigger(availableNow=True)
        .start(),
    )

    # upsert lane: serving table seeded from replica 0, change stream = the
    # full replay (1/5 updates, 4/5 inserts), partitioned by event_type
    table = os.path.join(work, "serving")
    base = normalize_event_ts(
        spark.read.parquet(staging), as_ntz=False
    ).filter("event_id < 10000000")
    write_partitioned_table(base, table, partition_cols=["event_type"])
    run(
        "stream_upsert_to_lake",
        lambda: stream_upsert_to_lake(
            source(),
            table,
            os.path.join(work, "ckpt_upsert"),
            partition_cols=["event_type"],
            key_cols=["event_id"],
        ),
    )

    print(json.dumps({"sf_dir": sf_dir, "replay_rows": n_rows, "ops": results}))


if __name__ == "__main__":
    main()
