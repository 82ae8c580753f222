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
