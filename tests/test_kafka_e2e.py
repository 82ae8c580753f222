"""Gated end-to-end Kafka pipeline test.

Wires the full transport path the reference runs through Kafka Connect
(`docker/kafka-connect/connectors/scylla-source.json:14-31` ->
`postgres-sink.json`): change events serialized into the envelope,
produced to a real topic, consumed via ``read_kafka_stream``, parsed,
and merged into keyed state — then compared against the batch oracle
over the same events.

Skips (rather than fails) when the environment lacks either
ingredient, per VERDICT r3 next-round #8:
- the spark-sql-kafka package on the classpath
  (``kafka_sql_available``), and
- a reachable broker, announced via ``SPARK_GRAFT_KAFKA_BOOTSTRAP``
  (e.g. ``localhost:9092``).
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.operators.cdc import as_change_stream, compact_latest
from scylla_pg_cdc_spark.sources.envelope import parse_envelope, unwrap_after
from scylla_pg_cdc_spark.sources.kafka import (
    kafka_sql_available,
    read_kafka_stream,
)
from scylla_pg_cdc_spark.sources.tables import load_table
from scylla_pg_cdc_spark.streaming.pipeline import (
    latest_state,
    merge_batch_into_state,
)
from tests.conftest import SF_SMALL

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")


def _require_kafka(spark) -> str:
    if not kafka_sql_available(spark):
        pytest.skip("spark-sql-kafka package not on classpath")
    if not BOOTSTRAP:
        pytest.skip("SPARK_GRAFT_KAFKA_BOOTSTRAP not set (no broker)")
    return BOOTSTRAP


def _change_rows(spark, n=200):
    return as_change_stream(
        load_table(spark, SF_SMALL, "events")
    ).orderBy("event_id").limit(n)


def _to_envelope_value(change):
    """Serialize change rows into the reference envelope JSON: the
    after-image (or before-image for DELETE) carries the change columns
    as a string map, commit_timestamp in microseconds."""
    img = F.create_map(
        F.lit("event_id"), F.col("event_id").cast("string"),
        F.lit("key"), F.col("key").cast("string"),
        F.lit("event_type"), F.col("event_type"),
        F.lit("value"), F.col("value").cast("string"),
        F.lit("props"), F.col("props"),
        F.lit("commit_ms"), F.col("commit_ms").cast("string"),
    )
    env = F.struct(
        F.concat(F.lit("corr-"), F.col("event_id")).alias("correlation_id"),
        F.when(F.col("op") == "DELETE", "DELETE")
        .otherwise("UPDATE")
        .alias("operation"),
        F.lit("events").alias("table_name"),
        F.create_map(
            F.lit("key"), F.col("key").cast("string")
        ).alias("primary_key"),
        F.when(F.col("op") == "DELETE", img).alias("before"),
        F.when(F.col("op") != "DELETE", img).alias("after"),
        (F.col("commit_ms") * 1000).alias("commit_timestamp"),
        F.col("commit_ms").alias("captured_at"),
        F.lit(1).alias("schema_version"),
    )
    return change.select(
        F.col("key").cast("string").alias("key"),
        F.to_json(env).alias("value"),
    )


def _payload_to_change(parsed):
    """Invert the envelope: typed change columns from the payload map
    (the test-side analog of the sink's Flatten+ReplaceField chain)."""
    p = F.col("payload")
    return parsed.select(
        p["event_id"].cast("long").alias("event_id"),
        p["key"].cast("long").alias("key"),
        F.when(F.col("cdc_operation") == "DELETE", "DELETE")
        .otherwise("UPSERT")
        .alias("op"),
        p["event_type"].alias("event_type"),
        p["value"].cast("double").alias("value"),
        p["props"].alias("props"),
        p["commit_ms"].cast("long").alias("commit_ms"),
    )


def test_kafka_roundtrip_to_state(spark, tmp_path):
    bootstrap = _require_kafka(spark)
    topic = f"graft_e2e_{uuid.uuid4().hex[:12]}"
    change = _change_rows(spark)

    # produce: batch write through the kafka sink
    (
        _to_envelope_value(change)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )

    # consume: readStream -> envelope parse -> unwrap -> typed change
    # -> foreachBatch state merge (availableNow drains the topic)
    stream = read_kafka_stream(
        spark,
        bootstrap,
        topic_pattern=topic,
        max_offsets_per_trigger=None,
    ).selectExpr("CAST(value AS STRING) AS value")
    typed = _payload_to_change(unwrap_after(parse_envelope(stream)))
    state_dir = str(tmp_path / "state")
    (
        typed.writeStream.foreachBatch(
            lambda b, _e: merge_batch_into_state(b, state_dir)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )

    got = {
        (r["key"], r["event_id"], r["event_type"])
        for r in latest_state(spark, state_dir).collect()
    }
    want = {
        (r["key"], r["event_id"], r["event_type"])
        for r in compact_latest(change).collect()
    }
    assert got == want and len(got) > 0
