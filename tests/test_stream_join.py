"""Stream-stream interval join: the watermarked streaming attribution
join must reproduce the batch join tree exactly (one definition of
correctness, two execution modes)."""

from __future__ import annotations

import os

import pytest

from scylla_pg_cdc_spark.streaming.joins import (
    attribution_pairs_batch,
    attribution_pairs_stream,
)
from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def batch_pairs(spark):
    return _rows(attribution_pairs_batch(spark, SF_SMALL))


def test_batch_attribution_nonempty_and_ordered(spark, batch_pairs):
    assert len(batch_pairs) > 0
    for _, _, _, view_ms, click_ms in batch_pairs:
        assert view_ms < click_ms <= view_ms + 60 * 60 * 1000


def test_stream_join_matches_batch(spark, batch_pairs, tmp_path):
    stream = attribution_pairs_stream(spark, SF_SMALL)
    assert stream.isStreaming
    name = "ssjoin_" + os.path.basename(str(tmp_path)).replace("-", "_")
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _rows(spark.table(name))
    assert got == batch_pairs


def test_stream_join_state_bounded_by_watermark(spark, tmp_path):
    """The join declares watermarks on both sides — the analyzed plan
    must carry event-time watermarks, which is what bounds state at
    scale (without them Spark would either reject the append-mode join
    or buffer forever)."""
    stream = attribution_pairs_stream(spark, SF_SMALL)
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
