"""TRUNCATE operation semantics (data-model.md:30-34): erases all
prior state; later upserts rebuild from empty."""

from __future__ import annotations

from scylla_pg_cdc_spark.operators.cdc import apply_truncates, compact_latest

SCHEMA = ("event_id long, key long, op string, event_type string, "
          "value double, props string, commit_ms long")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, k, op, "t", 0.0, "{}", ms) for i, k, op, ms in rows], SCHEMA
    )


def test_truncate_erases_prior_state(spark):
    change = _mk(spark, [
        (1, 100, "UPSERT", 10),
        (2, 200, "UPSERT", 20),
        (3, 0, "TRUNCATE", 30),
        (4, 100, "UPSERT", 40),
    ])
    state = compact_latest(apply_truncates(change))
    keys = {r["key"] for r in state.collect()}
    assert keys == {100}  # 200 truncated away; 100 re-inserted after


def test_no_truncate_passthrough(spark):
    change = _mk(spark, [(1, 1, "UPSERT", 10), (2, 2, "DELETE", 20)])
    out = apply_truncates(change)
    assert out.count() == 2


def test_multiple_truncates_use_latest(spark):
    change = _mk(spark, [
        (1, 1, "UPSERT", 10),
        (2, 0, "TRUNCATE", 20),
        (3, 2, "UPSERT", 30),
        (4, 0, "TRUNCATE", 40),
        (5, 3, "UPSERT", 50),
    ])
    state = compact_latest(apply_truncates(change))
    assert {r["key"] for r in state.collect()} == {3}


def test_truncate_tiebreak_on_event_id(spark):
    # same commit_ms: events with higher event_id than the TRUNCATE
    # survive (per-key log order tiebreak)
    change = _mk(spark, [
        (1, 1, "UPSERT", 10),
        (2, 0, "TRUNCATE", 10),
        (3, 2, "UPSERT", 10),
    ])
    state = compact_latest(apply_truncates(change))
    assert {r["key"] for r in state.collect()} == {2}


def test_compact_latest_agg_equals_window_variant(spark):
    """The max_by aggregation compaction must produce exactly the
    window compaction's rows (both keep_deleted modes) on the real
    events stream."""
    from scylla_pg_cdc_spark.operators.cdc import (
        as_change_stream,
        compact_latest,
        compact_latest_agg,
    )
    from scylla_pg_cdc_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    change = as_change_stream(load_table(spark, SF_SMALL, "events"))
    for keep in (False, True):
        a = sorted(
            map(tuple, compact_latest(change, keep_deleted=keep).collect())
        )
        b = sorted(
            map(tuple, compact_latest_agg(change, keep_deleted=keep).collect())
        )
        assert a == b


def test_truncate_hwm_crosses_column_maxima(spark):
    """Independent per-column maxima would fabricate HWM (30,9) from
    truncates at (20,9) and (30,2); the true HWM is (30,2), so an
    upsert at (30,5) must survive."""
    change = _mk(spark, [
        (9, 0, "TRUNCATE", 20),
        (2, 0, "TRUNCATE", 30),
        (5, 1, "UPSERT", 30),   # after (30,2), before phantom (30,9)
        (1, 2, "UPSERT", 25),   # before latest truncate -> erased
    ])
    state = compact_latest(apply_truncates(change))
    assert {r["key"] for r in state.collect()} == {1}
