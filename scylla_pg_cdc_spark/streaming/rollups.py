"""Streaming windowed rollups beyond plain counts: OHLC candles.

The batch face is ``operators/temporal.py:q_ohlc_bars`` (row_number
open/close picks folded into one exchange); the STREAMING form uses
``min_by``/``max_by`` over a struct(ts, event_id) ordering key inside
a tumbling event-time window — the declarative aggregate pair that
Structured Streaming can maintain incrementally (row_number over a
window frame cannot run on an unbounded stream; argmin/argmax state
is O(1) per group). The equivalence test proves the two formulations
produce identical bars on the same data — the repo-wide one
definition / two execution modes discipline.

Scale: state per (type, hour) group is constant (8 scalars); the
watermark bounds how many open windows exist. At 100 TB the candle
count grows with time span, not volume — same argument as the batch
face.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ohlc_bars_stream(stream: DataFrame, delay: str = "2 hours") -> DataFrame:
    """Hourly OHLC candles over a streaming (event_type, ts, event_id,
    value) frame. Cents quantization and (ts, event_id) tie rule
    match the batch query exactly."""
    vc = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    key = F.struct(F.unix_millis("ts").alias("ms"), F.col("event_id"))
    return (
        stream.filter(F.col("value").isNotNull())
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.min_by(vc, key).alias("open_c"),
            F.max(vc).alias("high_c"),
            F.min(vc).alias("low_c"),
            F.max_by(vc, key).alias("close_c"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(vc).alias("vol_c"),
        )
        .select(
            "event_type",
            F.unix_millis(F.col("window.start")).alias("hour_ms"),
            "open_c",
            "high_c",
            "low_c",
            F.col("close_c"),
            "n_events",
            F.col("vol_c").cast("long").alias("vol_c"),
        )
    )
