"""Custom stateful streaming operators via applyInPandasWithState.

For semantics the built-in windowed aggregations can't express, Spark's
arbitrary-stateful API keeps one typed state blob per key, updated
per micro-batch with Arrow-batched pandas input (the recommended
custom-stateful path; row-at-a-time Python never touches the hot loop).

``running_user_stats`` tracks, per user: lifetime event count, value
sum, last event timestamp — the streaming analog of the reference's
per-table counters (`src/monitoring/metrics.py:24-85`) with
exactly-once state under checkpointing. It runs with ``NoTimeout``
(state lives forever — fine for bounded key domains).

``running_user_stats_ttl`` is the long-running deployment path: a
watermark + ``EventTimeTimeout``. Every update arms
``state.setTimeoutTimestamp(last_event + ttl)``; when the watermark
passes that, the ``hasTimedOut`` branch emits one final row flagged
``evicted`` and removes the state — stale-entity eviction (the T4
stale-events policy), which is what bounds state size on an unbounded
key domain at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
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


EVICT_OUTPUT_SCHEMA = StructType(
    OUTPUT_SCHEMA.fields + [StructField("evicted", BooleanType())]
)


def _make_ttl_update(ttl_ms: int):
    """Closure carrying the TTL (applyInPandasWithState takes a bare
    function, so config rides in via closure, not arguments)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, vsum, last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "value_sum": [round(vsum, 2)],
                    "last_ms": [last],
                    "evicted": [True],
                }
            )
            return
        n, vsum, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            vsum += float(pdf["value"].fillna(0.0).sum())
            ts_max = pdf["ts_ms"].dropna().max()
            if pd.notna(ts_max):
                last = max(last, int(ts_max))
        state.update((n, vsum, last))
        # Arm eviction at last-event + TTL; Spark requires the timeout
        # to sit beyond the current watermark, so clamp up if this key
        # is already stale (it then evicts on the very next batch).
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last + ttl_ms, wm + 1))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "value_sum": [round(vsum, 2)],
                "last_ms": [last],
                "evicted": [False],
            }
        )

    return update


def running_user_stats_ttl(
    change_stream: DataFrame,
    ttl_ms: int = 30 * 60 * 1000,
    delay: str = "10 minutes",
) -> DataFrame:
    """TTL'd per-key accumulator over a change stream with columns
    (user_id, value, ts: timestamp). Same totals as
    ``running_user_stats`` while a key is live; once the watermark
    (event time minus ``delay``) passes a key's last event + ``ttl_ms``,
    the key emits a final ``evicted=true`` row and its state is freed."""
    with_wm = change_stream.withWatermark("ts", delay).select(
        "user_id",
        "value",
        "ts",
        (F.unix_millis("ts")).alias("ts_ms"),
    )
    return with_wm.groupBy("user_id").applyInPandasWithState(
        _make_ttl_update(ttl_ms),
        outputStructType=EVICT_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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


EWMA_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", LongType()),
    ]
)

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("ewma_cents", LongType()),
    ]
)


def _update_ewma(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, None)
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts_ms", "event_id"])
    for v in batch["vc"]:
        v = int(v)
        s = v if s is None else (7 * s + v) // 8
        n += 1
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [user_id], "n": [n], "ewma_cents": [s]}
    )


def running_ewma(change_stream: DataFrame) -> DataFrame:
    """Streaming EXACT infinite-horizon EWMA (alpha = 1/8): the
    applyInPandasWithState twin of the batch
    ``operators/features.py:q_event_ewma_exact`` fold. State per user
    is O(1) — (count, current smoothed cents) — so unlike the batch
    ``applyInPandas`` form nothing ever materializes a full group;
    this is the shape that survives a pathological single-key stream
    at 100 TB. Events are folded in (ts_ms, event_id) order WITHIN
    each micro-batch; cross-batch order is arrival order (the
    standard streaming contract — an in-order source reproduces the
    batch fold bit-for-bit, pinned in tests/test_stateful.py).

    Input columns: (user_id, vc: long cents, ts_ms, event_id)."""
    return change_stream.groupBy("user_id").applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 native arbitrary state: transformWithStateInPandas
# ---------------------------------------------------------------------------

try:  # Spark >= 4.0; guarded so the module imports everywhere
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningStatsProcessor(StatefulProcessor):
        """transformWithState port of ``running_user_stats``: one
        ValueState per user, updated from Arrow batches. The v2 API
        (Spark 4) replaces the (state, timeout) tuple-juggling of
        applyInPandasWithState with named state variables + timers and
        runs on the RocksDB state store — the deployment target where
        keyed state outgrows executor heap (exactly the 100 TB case).
        NOTE: the v2 state protocol is protobuf-over-socket; in
        environments without the protobuf wheel the equivalence test
        skips (tests/test_stateful.py gates on google.protobuf) and
        ``running_user_stats`` remains the executable path."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, vsum, last = (
                self._stats.get() if self._stats.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                vsum += float(pdf["value"].fillna(0.0).sum())
                ts_max = pdf["ts_ms"].dropna().max()
                if pd.notna(ts_max):
                    last = max(last, int(ts_max))
            self._stats.update((n, vsum, last))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_sum": [round(vsum, 2)],
                    "last_ms": [last],
                }
            )

        def close(self) -> None:
            pass

    def running_user_stats_tws(change_stream: DataFrame) -> DataFrame:
        """Spark-4-native face of ``running_user_stats`` (same input
        and output contract) via transformWithStateInPandas. Requires
        the RocksDB state store provider:

            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider")
        """
        return change_stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_RunningStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - Spark < 4
    pass
