"""Custom stateful streaming operator via applyInPandasWithState.

The escape hatch for streaming semantics the built-in windows can't
express (per-key accumulators, custom session logic, model state): state
lives in the state store per group, Arrow batches stream through Python,
and the watermark/timeout machinery bounds state growth. This is the
streaming analog of the batch applyInPandas operator (udf_grouped_pandas).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n_events long, total_value double"


def stream_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user event count + value total, maintained across
    micro-batches in the state store and re-emitted on every update."""

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HOLT_OUTPUT_SCHEMA = "user_id long, n_events long, level double, trend double"
HOLT_STATE_SCHEMA = "n_events long, level double, trend double"


def stream_holt(events: DataFrame) -> DataFrame:
    """Streaming twin of operators/timeseries.ts_holt: per-user Holt
    level+trend (alpha = beta = 1/4), the (level, trend) recursion
    carried across micro-batches in the state store.

    Bit-equality contract with the batch fold (asserted exactly in
    tests/test_stateful_streaming.py): within a batch rows fold in
    (ts, event_id) order, and the Python float ops mirror the batch
    expression's arithmetic DAG term-for-term — x*0.25 + (l+b)*0.75 for
    the level, (new_l - l)*0.25 + b*0.75 for the trend — so as long as
    batches arrive time-ordered (the replay contract of any log/CDC
    source), stream state equals the batch fold on the same prefix
    IEEE-bit-for-bit. State is 3 scalars per key — bounded regardless
    of stream length."""

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, level, trend = state.get
        else:
            n, level, trend = 0, None, None
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"].astype(float):
                if n == 0:
                    level, trend = v, 0.0
                else:
                    new_l = v * 0.25 + (level + trend) * 0.75
                    trend = (new_l - level) * 0.25 + trend * 0.75
                    level = new_l
                n += 1
        state.update((n, float(level), float(trend)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "level": [level], "trend": [trend]}
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=HOLT_OUTPUT_SCHEMA,
            stateStructType=HOLT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
