"""Two-phase parallel prefix sum: running totals over a
low-cardinality partition key without serializing on it.

``SUM(x) OVER (PARTITION BY key ORDER BY t)`` puts each key's entire
history on one task — the classic low-cardinality window trap (a
handful of event types at 100 TB = a handful of busy cores). The
decomposition:

1. running sums are computed inside (key, slice) partitions, where
   ``slice = t DIV slice_width`` — thousands of fine partitions;
2. each slice's opening offset comes from a tiny per-slice net table
   (keys x slices rows) cumulated with an ordinary window, then
   broadcast-joined back.

``prefix(t) = slice_offset(key, slice(t)) + running_within_slice(t)``
— exactly equal to the naive window (proven by ``q_interval_overlap``'s
naive-form oracle and the property test), with the slice width as the
parallelism/ledger-size dial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def two_phase_running_sum(
    df: DataFrame,
    key_col: str,
    t_col: str,
    val_col: str,
    slice_width: int,
    out_col: str = "running",
) -> DataFrame:
    """Append ``out_col`` = SUM(val) OVER (PARTITION BY key ORDER BY t
    ROWS UNBOUNDED PRECEDING) to ``df``. Requires (key, t) unique
    (pre-aggregate ties first — a running sum over tied order keys is
    not well-defined row-wise)."""
    sliced = df.withColumn(
        "__slice", F.expr(f"{t_col} DIV {slice_width}")
    )
    w_in = (
        Window.partitionBy(key_col, "__slice")
        .orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inslice = sliced.withColumn("__run_in", F.sum(val_col).over(w_in))
    slice_net = sliced.groupBy(key_col, "__slice").agg(
        F.sum(val_col).alias("__net")
    )
    w_slices = (
        Window.partitionBy(key_col)
        .orderBy("__slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = slice_net.select(
        key_col,
        "__slice",
        F.coalesce(F.sum("__net").over(w_slices), F.lit(0)).alias(
            "__off"
        ),
    )
    return (
        inslice.join(F.broadcast(offsets), [key_col, "__slice"])
        .withColumn(out_col, F.col("__off") + F.col("__run_in"))
        .drop("__slice", "__run_in", "__off")
    )
