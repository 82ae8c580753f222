"""Structured Streaming CDC consumer.

The streaming face of ``operators/cdc.py`` — same builder expressions,
executed under ``readStream`` with an ``availableNow`` trigger so runs
are finite and deterministic (SURVEY.md §7 phase 5).

Reference parity:
- micro-batch poll cadence (T1, `scylla-source.json:29-31`) ->
  trigger(availableNow) for tests / processingTime in production
- exactly-once (T9, idempotent producer + read_committed,
  `scylla-source.json:47-50`, `postgres-sink.json:105`) ->
  checkpointLocation WAL + idempotent overwrite-by-epoch sink
- upsert + delete materialization (S7/S8, `postgres-sink.json:22-24`)
  -> foreachBatch latest-state merge
- partial-update NULL-preserving merge
  (`docker/postgres/handle-partial-updates.sql:6-54`) ->
  last(col, ignorenulls=True) over the per-key commit order — NOT
  plain last-row-wins
- DLQ routing with retry context (S9/T8, `postgres-sink.json:32-33,
  98-103`) -> poison-predicate branch written to dlq/
- watermarked windowed rates (T4/T5, `alerts.py:79,92`)

Scale: state lives in partitioned parquet keyed by the CDC key; each
micro-batch shuffles once by key. At 100 TB the merge would target a
transactional table format; the compaction expression is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # int64 nanoseconds (see sources/tables.py)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

TOMBSTONE_TYPE = "error"


def poison_predicate():
    """Deterministic DLQ poison predicate (built lazily — Column
    construction needs an active session)."""
    return (F.get_json_object("props", "$.k").cast("long") > 90) | (
        F.col("value") < 1.0
    )


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source change stream over the events table (S2 analog —
    the CDC log poll becomes a file/Kafka readStream)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def to_change_events(stream: DataFrame) -> DataFrame:
    """Envelope-unwrap transform chain (P1-P6 analogs): normalize to
    (key, op, after-image, commit_ms)."""
    return stream.select(
        "event_id",
        F.col("user_id").alias("key"),
        F.when(F.col("event_type") == TOMBSTONE_TYPE, "DELETE")
        .otherwise("UPSERT")
        .alias("op"),
        "event_type",
        "value",
        "props",
        F.unix_millis("ts").alias("commit_ms"),
    )


def merge_batch_into_state(
    batch: DataFrame, state_dir: str, key: str = "key"
) -> None:
    """foreachBatch upsert merge (T7): union previous state with the
    micro-batch, keep latest per key (tombstones retained as
    ``__deleted`` rows so later upserts can resurrect the key).
    Overwrite-by-epoch => idempotent under replays (T9)."""
    spark = batch.sparkSession
    cols = ["event_id", key, "op", "event_type", "value", "props", "commit_ms"]
    try:
        prev = spark.read.parquet(state_dir).select(*cols)
        merged = prev.unionByName(batch.select(*cols))
    except Exception:  # first epoch: no state yet
        merged = batch.select(*cols)
    w = Window.partitionBy(key).orderBy(
        F.col("commit_ms").desc(), F.col("event_id").desc()
    )
    latest = (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    latest.write.mode("overwrite").parquet(state_dir + "_next")
    # atomic-ish swap via overwrite of the state dir
    spark.read.parquet(state_dir + "_next").write.mode("overwrite").parquet(state_dir)


def run_upsert_pipeline(
    spark: SparkSession, sf_dir: str, work_dir: str,
    max_retries: int = 10, backoff_ms: int = 3000,
) -> dict[str, str]:
    """End-to-end streaming CDC pipeline with DLQ split:
    readStream -> transform -> foreachBatch(main: upsert merge with
    retry/backoff; poison: append to dlq/). Returns output paths.

    The state merge is wrapped in the reference's retry policy
    (`max.retries=10, retry.backoff.ms=3000`,
    `postgres-sink.json:32-33`); if retries exhaust, the whole batch
    escalates to the DLQ with the error context
    (`data-model.md:477-489`)."""
    state_dir = os.path.join(work_dir, "state")
    dlq_dir = os.path.join(work_dir, "dlq")
    checkpoint = os.path.join(work_dir, "checkpoint")

    stream = to_change_events(read_event_stream(spark, sf_dir))

    def process(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.persist()
        try:
            poison = poison_predicate()
            poison_rows = batch.filter(poison).withColumn(
                "error_context", F.lit("poison predicate matched")
            ).withColumn("epoch_id", F.lit(epoch_id))
            if poison_rows.limit(1).count() > 0:
                poison_rows.write.mode("append").parquet(dlq_dir)
            merge = with_retries(
                merge_batch_into_state,
                max_retries=max_retries,
                backoff_ms=backoff_ms,
            )
            try:
                merge(batch.filter(~poison), state_dir)
            except Exception as e:  # noqa: BLE001 — retries exhausted
                batch.filter(~poison).withColumn(
                    "error_context", F.lit(f"merge failed: {e}")
                ).withColumn("epoch_id", F.lit(epoch_id)).write.mode(
                    "append"
                ).parquet(dlq_dir)
        finally:
            batch.unpersist()

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"state": state_dir, "dlq": dlq_dir, "checkpoint": checkpoint}


def latest_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Materialized target-table view: live rows only (tombstones
    filtered — the `delete.enabled=true` view)."""
    return spark.read.parquet(state_dir).filter(F.col("op") != "DELETE")


def run_windowed_rates(
    spark: SparkSession, sf_dir: str, work_dir: str, window: str = "1 day"
) -> DataFrame:
    """Watermarked tumbling-window counts (T4/T5/T6): the streaming
    twin of q_stream_tumbling; late data beyond 1 hour dropped."""
    stream = read_event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
        )
    )
    # Append mode + watermark would withhold the final (still-open)
    # window on a finite stream; complete mode emits every window at
    # termination. A production deployment appends closed windows to
    # parquet instead; the aggregation expression is identical.
    name = "rates_" + os.path.basename(work_dir).replace("-", "_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def compact_partial_updates(
    change: DataFrame,
    key: str,
    value_cols: list[str],
    order_cols: tuple[str, ...] = ("commit_ms", "event_id"),
) -> DataFrame:
    """NULL-preserving partial-update merge — the reference's
    BEFORE-UPDATE trigger semantics (`handle-partial-updates.sql:12-42`:
    IF NEW.x IS NULL THEN keep OLD.x).

    Plain last-row-wins would clobber columns a partial update left
    NULL; instead each column independently takes its last NON-NULL
    value in commit order: last(col, ignorenulls=True) over the per-key
    running frame (SURVEY.md §7 phase 5 hard part (a))."""
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = change
    for c in value_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    pick = Window.partitionBy(key).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        filled.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def with_retries(
    fn,
    max_retries: int = 10,
    backoff_ms: int = 3000,
    backoff_factor: float = 1.0,
    sleep=None,
):
    """Retry wrapper for sink operations (T8): the reference sink
    retries transient failures up to `max.retries=10` with
    `retry.backoff.ms=3000` (`postgres-sink.json:32-33`) before
    escalating to the DLQ (`data-model.md:477-489`).

    Returns the wrapped callable's result; raises the LAST error after
    exhausting retries (caller then routes the batch to the DLQ).
    ``sleep`` is injectable for tests."""
    import time as _time

    sleep = sleep or _time.sleep

    def run(*args, **kwargs):
        delay = backoff_ms / 1000.0
        last = None
        for attempt in range(max_retries + 1):
            try:
                return fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001
                last = e
                if attempt < max_retries:
                    sleep(delay)
                    delay *= backoff_factor
        raise last

    return run


def heartbeat_stream(spark: SparkSession, interval_sec: int = 1) -> DataFrame:
    """Synthetic liveness stream (T3, `heartbeat.interval.ms=1000`
    `scylla-source.json:43-44`): Spark's rate source emits one row per
    interval; used to advance watermarks on quiet change streams."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", max(1, int(1 / interval_sec)))
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.lit("heartbeat").alias("topic"),
            F.col("value").alias("seq"),
        )
    )
