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
