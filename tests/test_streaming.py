"""Streaming tests: each streaming operator must agree with its batch twin
when the whole file is replayed (stream == batch on bounded input)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_bridge_spark.registry import load_all
from data_bridge_spark.streaming.windows import (
    deliver_stream,
    read_events_stream,
    run_to_memory,
    stream_dedup,
    stream_drift_counts,
    stream_session_window,
    stream_sliding_counts,
    stream_tumbling_counts,
)

REG = load_all()


def _canon_rows(df, ts_cols=("window_start",)):
    rows = []
    for r in df.collect():
        d = r.asDict()
        for c in ts_cols:
            if c in d and d[c] is not None:
                d[c] = d[c].replace(tzinfo=None).isoformat()
        rows.append(tuple(sorted(d.items())))
    return sorted(rows)


def test_stream_tumbling_matches_batch(spark, sf_dir):
    stream = run_to_memory(stream_tumbling_counts(read_events_stream(spark, sf_dir)), mode="complete")
    batch = REG["win_tumbling"].fn(spark, sf_dir)
    assert _canon_rows(stream) == _canon_rows(batch)


def test_stream_sliding_matches_batch(spark, sf_dir):
    stream = run_to_memory(stream_sliding_counts(read_events_stream(spark, sf_dir)), mode="complete")
    batch = REG["win_sliding"].fn(spark, sf_dir)
    assert _canon_rows(stream) == _canon_rows(batch)


def test_stream_session_matches_batch(spark, sf_dir):
    stream = run_to_memory(stream_session_window(read_events_stream(spark, sf_dir)), mode="complete")
    batch = REG["win_session"].fn(spark, sf_dir)
    s = {(r.user_id, r.n_events, r.session_start.replace(tzinfo=None)) for r in stream.collect()}
    b = {(r.user_id, r.n_events, r.session_start) for r in batch.collect()}
    assert s == b


def test_stream_dedup_keeps_unique_ids(spark, sf_dir):
    out = run_to_memory(stream_dedup(read_events_stream(spark, sf_dir)))
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.count() == out.select("event_id").distinct().count() == n_events


def test_foreach_batch_delivery(spark, sf_dir, tmp_path):
    seen = []

    def sink(batch_df, epoch_id):
        seen.append((epoch_id, batch_df.count()))

    q = deliver_stream(
        stream_tumbling_counts(read_events_stream(spark, sf_dir)),
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        mode="update",
    )
    q.processAllAvailable()
    q.stop()
    assert seen and sum(n for _, n in seen) > 0


def test_stream_drift_counts_match_batch_tv(spark, sf_dir):
    """The streamed per-(window, type) counts reproduce batch dq_drift's
    total-variation distance exactly (same integer-arithmetic formula)."""
    stream = run_to_memory(
        stream_drift_counts(read_events_stream(spark, sf_dir)), mode="complete"
    )
    rows = stream.collect()
    starts = sorted({r.window_start for r in rows})
    assert len(starts) == 2  # days 1-15 and 16-30
    a = {r.event_type: r.n_events for r in rows if r.window_start == starts[0]}
    b = {r.event_type: r.n_events for r in rows if r.window_start == starts[1]}
    na, nb = sum(a.values()), sum(b.values())
    num = sum(
        abs(a.get(t, 0) * nb - b.get(t, 0) * na) for t in set(a) | set(b)
    )
    tv_stream = float(num) / (2.0 * float(na) * float(nb))
    batch = REG["dq_drift"].fn(spark, sf_dir).collect()
    tv_batch = batch[0]["tv_dist"]
    assert tv_stream == tv_batch
    # and the raw counts agree with the batch operator's per-type rows
    batch_counts = {r.event_type: (r.n_a, r.n_b) for r in batch}
    for t, (n_a, n_b) in batch_counts.items():
        assert a.get(t, 0) == n_a and b.get(t, 0) == n_b
