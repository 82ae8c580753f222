"""Bucketed keyed-state merge: an epoch rewrites only the state
buckets its batch touches (VERDICT r1 "Next round" #2 — replaces the
O(state)-per-epoch full rewrite).

Proof is physical, not just logical: untouched buckets' parquet files
are carried into the next epoch as hardlinks, so their inodes are
IDENTICAL across epochs; only touched buckets get new inodes.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from scylla_pg_cdc_spark.streaming.pipeline import (
    _bucket_dirs,
    merge_batch_into_state,
)

CHANGE_SCHEMA = (
    "event_id long, key long, op string, event_type string, "
    "value double, props string, commit_ms long"
)


def _mk_batch(spark, keys, *, base_event_id=0, commit_ms=1_000, op="UPSERT"):
    rows = [
        (base_event_id + i, int(k), op, "click", 1.0, "{}", commit_ms + i)
        for i, k in enumerate(keys)
    ]
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _bucket_inodes(state_dir: str) -> dict[int, frozenset[int]]:
    out = {}
    for b, entry in _bucket_dirs(state_dir).items():
        d = os.path.join(state_dir, entry)
        out[b] = frozenset(
            os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if not f.startswith(".")
        )
    return out


def test_epoch_rewrites_only_touched_buckets(spark, tmp_path):
    state = str(tmp_path / "state")
    n = 64
    merge_batch_into_state(
        _mk_batch(spark, range(2_000)), state, n_buckets=n
    )
    assert len(_bucket_dirs(state)) == n  # 2000 keys cover all 64
    before = _bucket_inodes(state)

    # epoch 2: update ~30 keys that all live in ONE bucket
    b0_keys = [
        r["key"]
        for r in spark.read.parquet(state)
        .filter(F.col("__bucket") == 0)
        .limit(30)
        .collect()
    ]
    assert b0_keys
    merge_batch_into_state(
        _mk_batch(spark, b0_keys, base_event_id=100_000, commit_ms=9_000_000),
        state,
        n_buckets=n,
    )
    after = _bucket_inodes(state)

    changed = {b for b in after if after[b] != before.get(b)}
    assert changed == {0}, f"rewrote buckets {sorted(changed)}, expected {{0}}"
    # ~1/64 of the state's files were rewritten; the other 63 buckets
    # are the SAME inodes (hardlinks — zero bytes rewritten)
    carried = sum(len(after[b]) for b in after if b != 0)
    rewritten = len(after[0])
    assert rewritten <= carried / 10

    # and the merge is still correct: all keys live, updates won
    live = spark.read.parquet(state)
    assert live.count() == 2_000
    updated = {
        r["key"]: r["event_id"]
        for r in live.filter(F.col("key").isin(b0_keys)).collect()
    }
    assert all(eid >= 100_000 for eid in updated.values())


def test_bucketed_merge_matches_flat_semantics(spark, tmp_path):
    """Same inputs through the bucketed merge == one-shot compaction
    (upserts, out-of-order rows, tombstone, resurrection)."""
    from scylla_pg_cdc_spark.operators.cdc import compact_latest_agg

    state = str(tmp_path / "state")
    e1 = _mk_batch(spark, [1, 2, 3, 4, 5], commit_ms=1_000)
    e2 = _mk_batch(spark, [3, 4], base_event_id=100, commit_ms=5_000)
    # out-of-order: OLDER event for key 5 arrives in a later epoch
    e3 = _mk_batch(spark, [5], base_event_id=200, commit_ms=500)
    # tombstone key 1, then resurrect it
    e4 = _mk_batch(spark, [1], base_event_id=300, commit_ms=6_000, op="DELETE")
    e5 = _mk_batch(spark, [1], base_event_id=400, commit_ms=7_000)
    for e in (e1, e2, e3, e4, e5):
        merge_batch_into_state(e, state, n_buckets=8)

    got = {
        (r["key"], r["event_id"], r["op"], r["commit_ms"])
        for r in spark.read.parquet(state).drop("__bucket").collect()
    }
    want = {
        (r["key"], r["event_id"], r["op"], r["commit_ms"])
        for r in compact_latest_agg(
            e1.unionByName(e2).unionByName(e3).unionByName(e4).unionByName(e5),
            keep_deleted=True,
        ).collect()
    }
    assert got == want


def test_migration_from_flat_layout(spark, tmp_path):
    """A state dir written by the round-1 flat merge is upgraded to the
    bucketed layout on the next epoch with nothing lost."""
    state = str(tmp_path / "state")
    flat = _mk_batch(spark, range(50), commit_ms=1_000)
    flat.write.mode("overwrite").parquet(state)  # old layout: no buckets
    assert not _bucket_dirs(state)

    merge_batch_into_state(
        _mk_batch(spark, [7], base_event_id=999, commit_ms=9_000),
        state,
        n_buckets=8,
    )
    assert _bucket_dirs(state)  # migrated
    live = spark.read.parquet(state)
    assert live.count() == 50
    assert live.filter(F.col("key") == 7).head()["event_id"] == 999


def test_mv_fold_rewrites_only_touched_buckets(spark, tmp_path):
    """The incremental-MV fold gets the same O(delta) treatment: an
    epoch whose delta touches one group rewrites only that group's
    bucket (hardlink inodes prove the rest untouched)."""
    from pyspark.sql import functions as F

    from scylla_pg_cdc_spark.streaming.pipeline import fold_mv_bucketed

    mv = str(tmp_path / "mv")
    schema = "grp string, v double"
    empty = spark.createDataFrame([], schema)
    seed = spark.createDataFrame(
        [(f"g{i}", float(i)) for i in range(400)], schema
    )
    fold_mv_bucketed(mv, empty, seed, ["grp"], ["v"], "epoch-0", n_buckets=64)
    before = _bucket_inodes(mv)
    assert len(before) == 64

    delta_add = spark.createDataFrame([("g7", 100.0)], schema)
    fold_mv_bucketed(
        mv, empty, delta_add, ["grp"], ["v"], "epoch-1", n_buckets=64
    )
    after = _bucket_inodes(mv)
    changed = {b for b in after if after[b] != before.get(b)}
    assert len(changed) == 1, f"rewrote {len(changed)} MV buckets"

    rows = {
        r["grp"]: (r["n_rows"], r["sum_v"])
        for r in spark.read.parquet(mv).filter(F.col("grp") == "g7").collect()
    }
    assert rows == {"g7": (2, 107.0)}
    with open(f"{mv}/_EPOCH") as f:
        assert f.read() == "epoch-1"


def test_mv_fold_marker_only_on_empty_delta(spark, tmp_path):
    from scylla_pg_cdc_spark.streaming.pipeline import fold_mv_bucketed

    mv = str(tmp_path / "mv")
    schema = "grp string, v double"
    empty = spark.createDataFrame([], schema)
    seed = spark.createDataFrame([("a", 1.0), ("b", 2.0)], schema)
    fold_mv_bucketed(mv, empty, seed, ["grp"], ["v"], "epoch-0", n_buckets=8)
    before = _bucket_inodes(mv)
    fold_mv_bucketed(mv, empty, empty, ["grp"], ["v"], "epoch-1", n_buckets=8)
    assert _bucket_inodes(mv) == before  # zero data movement
    with open(f"{mv}/_EPOCH") as f:
        assert f.read() == "epoch-1"


def test_empty_batch_is_noop(spark, tmp_path):
    state = str(tmp_path / "state")
    merge_batch_into_state(_mk_batch(spark, range(100)), state, n_buckets=8)
    before = _bucket_inodes(state)
    merge_batch_into_state(_mk_batch(spark, []), state, n_buckets=8)
    assert _bucket_inodes(state) == before
