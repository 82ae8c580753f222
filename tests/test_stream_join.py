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


def test_join_view_maintained_under_streaming_epochs(spark, tmp_path):
    """Join-view IVM driven by a REAL multi-epoch stream: events arrive
    one file per micro-batch (maxFilesPerTrigger=1), foreachBatch folds
    each epoch's touched keys through maintain_join_view against a
    static dimension, and the final view must equal the batch join of
    (latest state x dimension)."""
    import glob
    import shutil

    from scylla_pg_cdc_spark.streaming.mv import maintain_join_view

    src = tmp_path / "stream_src"
    src.mkdir()
    epochs = [
        [(1, 10, 100), (2, 20, 100)],
        [(1, 11, 200), (3, 30, 200)],
        [(2, 21, 300)],
    ]
    schema = "user_id long, value long, commit_ms long"
    for i, rows in enumerate(epochs):
        stage = str(tmp_path / f"stage_{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        shutil.copy(part, str(src / f"epoch_{i}.parquet"))

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, "bronze")], "user_id long, tier string"
    )

    state: dict[int, tuple[int, int]] = {}
    view_holder = {"view": None}

    def process(batch, _epoch_id):
        touched = batch.select("user_id").distinct()
        for r in batch.collect():
            cur = state.get(r["user_id"])
            if cur is None or r["commit_ms"] >= cur[1]:
                state[r["user_id"]] = (r["value"], r["commit_ms"])
        a_new = spark.createDataFrame(
            [(k, v) for k, (v, _) in state.items()], "user_id long, value long"
        )
        view = maintain_join_view(
            view_holder["view"], a_new, dim, touched, "user_id"
        )
        view_holder["view"] = spark.createDataFrame(
            view.collect(), view.schema
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    a_final = spark.createDataFrame(
        [(k, v) for k, (v, _) in state.items()], "user_id long, value long"
    )
    want = sorted(tuple(r) for r in a_final.join(dim, "user_id").collect())
    got = sorted(tuple(r) for r in view_holder["view"].collect())
    assert got == want
    assert {r[0] for r in got} == {1, 2, 3}
