"""Metrics/alerting tests (reference monitoring-layer parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scylla_pg_cdc_spark.functions.metrics import (
    ProgressListener,
    default_rules,
    evaluate_alerts,
    histogram,
    percentile_summary,
    rate_over_windows,
)
from scylla_pg_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_histogram_buckets_cover_all_rows(spark):
    events = load_table(spark, SF_SMALL, "events")
    h = histogram(events, "value", [25.0, 50.0, 100.0, 200.0])
    rows = h.collect()
    assert sum(r["n"] for r in rows) == events.count()
    labels = sorted(r["bucket"] for r in rows)
    assert labels[0].startswith("0_lt_") or labels[0].startswith("00_")


def test_percentile_summary_ordering(spark):
    events = load_table(spark, SF_SMALL, "events")
    s = percentile_summary(events, "value", by=["event_type"]).collect()
    for r in s:
        assert r["min_v"] <= r["p50"] <= r["p95"] <= r["p99"] <= r["max_v"]
        assert r["n"] > 0


def test_rate_over_windows(spark):
    events = load_table(spark, SF_SMALL, "events")
    r = rate_over_windows(events, "ts", "1 day")
    rows = r.collect()
    assert sum(x["n"] for x in rows) == events.count()
    for x in rows:
        assert abs(x["rate_per_sec"] - x["n"] / 86400.0) < 1e-9


def test_alert_rules_fire_on_thresholds(spark):
    metrics = spark.createDataFrame(
        [
            ("orders", 120.0, 99.5, 5),     # healthy
            ("users", 450.0, 99.9, 0),      # lag warning
            ("items", 1200.0, 85.0, 2000),  # lag crit + acc crit + dlq crit (+warn)
        ],
        "table string, lag_sec double, accuracy_pct double, dlq_depth long",
    )
    fired = evaluate_alerts(metrics, default_rules()).collect()
    by_name = {}
    for r in fired:
        by_name.setdefault(r["alert"], []).append(r)
    assert "replication_lag_high" in by_name  # users + items
    assert len(by_name["replication_lag_high"]) == 2
    assert len(by_name["replication_lag_critical"]) == 1
    assert len(by_name["accuracy_critical"]) == 1
    assert len(by_name["dlq_depth_critical"]) == 1
    assert '"table":"items"' in by_name["dlq_depth_critical"][0]["context"]


def test_progress_listener_captures_batches(spark, tmp_path):
    listener = ProgressListener()
    spark.streams.addListener(listener)
    try:
        from scylla_pg_cdc_spark.streaming.pipeline import read_event_stream

        stream = read_event_stream(spark, SF_SMALL)
        q = (
            stream.groupBy("event_type")
            .count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("listener_smoke")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered asynchronously
        import time

        deadline = time.time() + 15
        while time.time() < deadline and not listener.progress:
            time.sleep(0.25)
        assert listener.progress, "no progress events captured"
        assert sum(p["num_input_rows"] for p in listener.progress) > 0
    finally:
        spark.streams.removeListener(listener)


def test_evaluate_alerts_empty_rules_returns_empty(spark):
    metrics = spark.createDataFrame([(1.0,)], "lag_sec double")
    out = evaluate_alerts(metrics, [])
    assert out.count() == 0
    assert out.columns == ["alert", "severity", "context"]
