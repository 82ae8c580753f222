"""Retry-with-backoff (T8) and heartbeat stream (T3) tests."""

from __future__ import annotations

import pytest

from scylla_pg_cdc_spark.sources.kafka import kafka_source_options
from scylla_pg_cdc_spark.streaming.pipeline import heartbeat_stream, with_retries


def test_retry_succeeds_after_transient_failures():
    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise IOError("transient")
        return "ok"

    wrapped = with_retries(flaky, max_retries=10, backoff_ms=3000,
                           sleep=sleeps.append)
    assert wrapped() == "ok"
    assert calls["n"] == 4
    assert sleeps == [3.0, 3.0, 3.0]  # retry.backoff.ms=3000


def test_retry_exhaustion_raises_for_dlq_escalation():
    def always_fails():
        raise IOError("permanent")

    wrapped = with_retries(always_fails, max_retries=2, sleep=lambda s: None)
    with pytest.raises(IOError, match="permanent"):
        wrapped()


def test_retry_exponential_backoff():
    sleeps = []

    def fails():
        raise IOError("x")

    wrapped = with_retries(fails, max_retries=3, backoff_ms=1000,
                           backoff_factor=2.0, sleep=sleeps.append)
    with pytest.raises(IOError):
        wrapped()
    assert sleeps == [1.0, 2.0, 4.0]


def test_heartbeat_stream_emits_rows(spark):
    hb = heartbeat_stream(spark, interval_sec=1)
    assert hb.isStreaming
    q = (
        hb.writeStream.outputMode("append")
        .format("memory")
        .queryName("hb_smoke")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        while time.time() < deadline and spark.table("hb_smoke").count() == 0:
            time.sleep(0.5)
        rows = spark.table("hb_smoke").collect()
        assert len(rows) >= 1
        assert all(r["topic"] == "heartbeat" for r in rows)
    finally:
        q.stop()


def test_kafka_source_options_mirror_reference_tuning():
    opts = kafka_source_options("broker:9092")
    assert opts["kafka.isolation.level"] == "read_committed"
    assert opts["failOnDataLoss"] == "false"
    assert opts["maxOffsetsPerTrigger"] == "3000"  # healthy batch band
    assert opts["subscribePattern"].startswith("scylla-cluster")
