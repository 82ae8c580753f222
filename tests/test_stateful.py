"""applyInPandasWithState e2e: per-user running stats over the real
event stream must equal the batch aggregation."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from scylla_pg_cdc_spark.sources.tables import load_table
from scylla_pg_cdc_spark.streaming.pipeline import read_event_stream
from scylla_pg_cdc_spark.streaming.stateful import running_user_stats
from tests.conftest import SF_SMALL


def test_stateful_user_stats_match_batch(spark):
    stream = read_event_stream(spark, SF_SMALL).select(
        "user_id", "value", F.unix_millis("ts").alias("ts_ms")
    )
    out = running_user_stats(stream)
    name = "stateful_" + os.path.basename(tempfile.mkdtemp()).replace("-", "_")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per user = final state
    got = {}
    for r in spark.table(name).collect():
        got[r["user_id"]] = (r["n_events"], r["value_sum"], r["last_ms"])

    events = load_table(spark, SF_SMALL, "events")
    want = {
        r["user_id"]: (r["n"], r["s"], r["m"])
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
            F.max(F.unix_millis("ts")).alias("m"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][0] == want[uid][0], uid
        assert abs(got[uid][1] - want[uid][1]) < 0.02, uid
        assert got[uid][2] == want[uid][2], uid


def test_event_time_ttl_evicts_stale_keys(spark, tmp_path):
    """EventTimeTimeout deployment path: a key idle past its TTL emits
    one final evicted=true row and frees its state; live keys keep
    accumulating. Three files -> three micro-batches (maxFilesPerTrigger
    =1 under availableNow), so the watermark advances between batches
    and the timeout actually fires inside a finite run."""
    from pyspark.sql import Row
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from scylla_pg_cdc_spark.streaming.stateful import running_user_stats_ttl

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
            StructField("ts", TimestampType()),
        ]
    )
    import datetime as dt

    def t(hour, minute=0):
        return dt.datetime(2024, 1, 1, hour, minute)

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [Row(user_id=1, value=5.0, ts=t(10)), Row(user_id=2, value=1.0, ts=t(10))],
        [Row(user_id=2, value=2.0, ts=t(12))],  # watermark -> 11:50 > u1 TTL 10:30
        [Row(user_id=2, value=3.0, ts=t(14))],  # timeout fires this batch
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    # one top-level dir per batch won't work for the file source; flatten
    # the part files into src with mtimes forcing batch order
    import os
    import shutil

    for i in range(len(batches)):
        d = src / f"b{i}"
        part = next(p for p in os.listdir(d) if p.endswith(".parquet"))
        dst = src / f"{i:03d}.parquet"
        shutil.move(str(d / part), str(dst))
        shutil.rmtree(str(d))
        os.utime(str(dst), (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = running_user_stats_ttl(
        stream, ttl_ms=30 * 60 * 1000, delay="10 minutes"
    )
    name = "ttl_" + os.path.basename(tempfile.mkdtemp()).replace("-", "_")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()

    evicted = [r for r in rows if r["evicted"]]
    assert [(r["user_id"], r["n_events"], r["value_sum"]) for r in evicted] == [
        (1, 1, 5.0)
    ]
    u2 = [r for r in rows if r["user_id"] == 2 and not r["evicted"]]
    assert max(r["n_events"] for r in u2) == 3
    live_u1 = [r for r in rows if r["user_id"] == 1 and not r["evicted"]]
    assert len(live_u1) == 1 and live_u1[0]["n_events"] == 1


def test_transform_with_state_matches_apply_in_pandas(spark, tmp_path):
    """The Spark-4 transformWithState face must produce the same final
    per-user totals as the applyInPandasWithState implementation (same
    reducer, different state API + RocksDB store)."""
    import pytest

    from scylla_pg_cdc_spark.streaming import stateful

    if not hasattr(stateful, "running_user_stats_tws"):
        pytest.skip("transformWithState needs Spark >= 4")
    # the transformWithState state protocol is protobuf-based; without
    # the protobuf wheel the driver worker can't start (verified: it
    # crashes in StateMessage_pb2). Same gating pattern as the
    # spark-avro cross-check in test_avro_codec.py.
    pytest.importorskip("google.protobuf")
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, SF_SMALL).select(
            "user_id", "value", F.unix_millis("ts").alias("ts_ms")
        )
        out = stateful.running_user_stats_tws(stream)
        name = "tws_" + os.path.basename(tempfile.mkdtemp()).replace("-", "_")
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {}
        for r in spark.table(name).collect():
            got[r["user_id"]] = (r["n_events"], r["value_sum"], r["last_ms"])
        events = load_table(spark, SF_SMALL, "events")
        want = {
            r["user_id"]: (r["n"], r["s"], r["m"])
            for r in events.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("s"),
                F.max(F.unix_millis("ts")).alias("m"),
            )
            .collect()
        }
        assert set(got) == set(want)
        for uid in want:
            assert got[uid][0] == want[uid][0], uid
            assert abs(got[uid][1] - want[uid][1]) < 0.02, uid
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_streaming_ewma_matches_batch_fold(spark):
    """The O(1)-state streaming EWMA must reproduce the batch
    applyInPandas fold bit-for-bit when the source is in order (one
    parquet file -> one micro-batch, sorted within the batch)."""
    from scylla_pg_cdc_spark.operators.features import q_event_ewma_exact
    from scylla_pg_cdc_spark.streaming.stateful import running_ewma

    stream = (
        read_event_stream(spark, SF_SMALL)
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.floor(F.col("value") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("vc"),
            F.unix_millis("ts").alias("ts_ms"),
        )
    )
    out = running_ewma(stream)
    name = "ewma_" + os.path.basename(tempfile.mkdtemp()).replace("-", "_")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n"], r["ewma_cents"])
        for r in spark.table(name).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["ewma_cents"])
        for r in q_event_ewma_exact(spark, SF_SMALL).collect()
    }
    assert got == want
