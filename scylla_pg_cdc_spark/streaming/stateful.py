"""Custom stateful streaming operators via applyInPandasWithState.

For semantics the built-in windowed aggregations can't express, Spark's
arbitrary-stateful API keeps one typed state blob per key, updated
per micro-batch with Arrow-batched pandas input (the recommended
custom-stateful path; row-at-a-time Python never touches the hot loop).

``running_user_stats`` tracks, per user: lifetime event count, value
sum, last event timestamp — the streaming analog of the reference's
per-table counters (`src/monitoring/metrics.py:24-85`) with
exactly-once state under checkpointing. This build runs with
``NoTimeout`` (finite availableNow tests); a long-running deployment
switches ``timeoutConf`` to EventTimeTimeout + a watermark and calls
``state.setTimeoutTimestamp`` per update — the ``hasTimedOut``
branch below is the eviction hook that then fires (stale-entity
eviction, the T4 stale-events policy).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_ms", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_ms", LongType()),
    ]
)


def _update_user_stats(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, vsum, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        vsum += float(pdf["value"].fillna(0.0).sum())
        ts_max = pdf["ts_ms"].dropna().max()  # all-null chunk -> NaN
        if pd.notna(ts_max):
            last = max(last, int(ts_max))
    state.update((n, vsum, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "value_sum": [round(vsum, 2)],
            "last_ms": [last],
        }
    )


def running_user_stats(change_stream: DataFrame) -> DataFrame:
    """Arbitrary-stateful per-key accumulator over a change stream with
    columns (user_id, value, ts_ms). Emits the updated totals for every
    key touched in each micro-batch."""
    return (
        change_stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
