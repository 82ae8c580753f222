"""run_upsert_pipeline(state_mode='lsm'): the end-to-end streaming
pipeline over the LSM state store must produce the SAME live state,
DLQ, and MV as the eager-merge mode — only the physical write strategy
differs."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from scylla_pg_cdc_spark.streaming.pipeline import (
    latest_state,
    run_upsert_pipeline,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def both_modes(spark):
    dirs = {}
    for mode in ("merge", "lsm"):
        d = tempfile.mkdtemp(prefix=f"cdc_{mode}_")
        dirs[mode] = run_upsert_pipeline(
            spark, SF_SMALL, d,
            mv_spec=(["event_type"], ["value"]),
            state_mode=mode,
        )
    yield dirs
    for mode in dirs:
        shutil.rmtree(dirs[mode]["state"].rsplit("/", 1)[0], ignore_errors=True)


def test_lsm_live_state_matches_merge_mode(spark, both_modes):
    def live(out):
        return {
            r["key"]: (r["event_id"], r["event_type"])
            for r in latest_state(spark, out["state"]).collect()
        }

    merge_live = live(both_modes["merge"])
    lsm_live = live(both_modes["lsm"])
    assert merge_live == lsm_live
    assert len(merge_live) > 0


def test_lsm_dlq_matches_merge_mode(spark, both_modes):
    n_merge = spark.read.parquet(both_modes["merge"]["dlq"]).count()
    n_lsm = spark.read.parquet(both_modes["lsm"]["dlq"]).count()
    assert n_merge == n_lsm > 0


def test_lsm_mv_matches_merge_mode(spark, both_modes):
    def mv(out):
        return {
            r["event_type"]: (r["n_rows"], round(r["sum_value"], 2))
            for r in spark.read.parquet(out["mv"])
            .select("event_type", "n_rows", "sum_value")
            .collect()
        }

    assert mv(both_modes["merge"]) == mv(both_modes["lsm"])


def test_unknown_mode_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="state_mode"):
        run_upsert_pipeline(
            spark, SF_SMALL, str(tmp_path), state_mode="bogus"
        )


def test_lsm_multi_epoch_exactly_once(spark, tmp_path):
    """Multi-epoch LSM run + checkpoint replay: rerunning with the
    same checkpoint must not change the live state."""
    import os

    # re-encode events as parquet part FILES with the raw ns schema
    # (same construction as test_multi_epoch_pipeline_equals_single_batch)
    src_dir = str(tmp_path / "src")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events_raw = spark.read.parquet(SF_SMALL + "/events.parquet")
    events_raw.repartition(3).write.parquet(src_dir)
    assert len([f for f in os.listdir(src_dir) if f.endswith(".parquet")]) >= 3

    work = str(tmp_path / "run")
    out = run_upsert_pipeline(
        spark, src_dir, work, glob="*.parquet",
        max_files_per_trigger=1, state_mode="lsm",
    )
    before = latest_state(spark, out["state"]).count()
    run_upsert_pipeline(
        spark, src_dir, work, glob="*.parquet",
        max_files_per_trigger=1, state_mode="lsm",
    )
    after = latest_state(spark, out["state"]).count()
    assert before == after > 0
