"""LSM-style state (append + merge-on-read + amortized compaction):
semantic equivalence with one-shot compaction, replay idempotence,
file-count control, and the O(batch) append property."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from scylla_pg_cdc_spark.operators.cdc import compact_latest_agg
from scylla_pg_cdc_spark.streaming.lsm_state import (
    append_epoch,
    buckets_needing_compaction,
    compact_buckets,
    compact_buckets_parallel,
    maintain,
    read_latest,
)
from tests.test_bucketed_state import CHANGE_SCHEMA, _mk_batch


def _want(spark, epochs):
    u = epochs[0]
    for e in epochs[1:]:
        u = u.unionByName(e)
    return {
        (r["key"], r["event_id"], r["op"])
        for r in compact_latest_agg(u, keep_deleted=True).collect()
    }


def test_lsm_matches_one_shot_compaction(spark, tmp_path):
    state = str(tmp_path / "state")
    e1 = _mk_batch(spark, [1, 2, 3, 4, 5], commit_ms=1_000)
    e2 = _mk_batch(spark, [3, 4], base_event_id=100, commit_ms=5_000)
    e3 = _mk_batch(spark, [5], base_event_id=200, commit_ms=500)  # out of order
    e4 = _mk_batch(spark, [1], base_event_id=300, commit_ms=6_000, op="DELETE")
    e5 = _mk_batch(spark, [1], base_event_id=400, commit_ms=7_000)  # resurrect
    for e in (e1, e2, e3, e4, e5):
        append_epoch(e, state, n_buckets=8)
    got = {
        (r["key"], r["event_id"], r["op"])
        for r in read_latest(spark, state).collect()
    }
    assert got == _want(spark, [e1, e2, e3, e4, e5])


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    e1 = _mk_batch(spark, range(50), commit_ms=1_000)
    append_epoch(e1, state, n_buckets=8)
    append_epoch(e1, state, n_buckets=8)  # crash-replay of the same epoch
    out = read_latest(spark, state)
    assert out.count() == 50


def test_compaction_bounds_files_and_preserves_result(spark, tmp_path):
    state = str(tmp_path / "state")
    epochs = []
    for e in range(12):
        b = _mk_batch(
            spark, range(40), base_event_id=1000 * e, commit_ms=1_000 * (e + 1)
        )
        epochs.append(b)
        append_epoch(b, state, n_buckets=4)
    before = {
        (r["key"], r["event_id"]) for r in read_latest(spark, state).collect()
    }
    todo = buckets_needing_compaction(state, file_threshold=8)
    assert todo  # 12 epochs > threshold in every touched bucket
    compact_buckets(spark, state, todo)
    assert not buckets_needing_compaction(state, file_threshold=8)
    after = {
        (r["key"], r["event_id"]) for r in read_latest(spark, state).collect()
    }
    assert after == before == {
        (r["key"], r["event_id"]) for r in _want_rows(spark, epochs)
    }


def _want_rows(spark, epochs):
    u = epochs[0]
    for e in epochs[1:]:
        u = u.unionByName(e)
    return compact_latest_agg(u, keep_deleted=True).collect()


def test_maintain_runs_lifecycle(spark, tmp_path):
    state = str(tmp_path / "state")
    compacted_any = []
    for e in range(10):
        b = _mk_batch(
            spark, range(30), base_event_id=1000 * e, commit_ms=1_000 * (e + 1)
        )
        compacted_any += maintain(b, state, n_buckets=4, file_threshold=6)
    assert compacted_any  # lifecycle actually compacted something
    assert read_latest(spark, state).count() == 30


def test_append_cost_independent_of_state_size(spark, tmp_path):
    """The property the eager merge can't give on uniformly-keyed
    batches: appending an epoch costs the same against a 200k-key
    state as against an empty one (no read of existing state)."""
    small = str(tmp_path / "small")
    big = str(tmp_path / "big")
    append_epoch(_mk_batch(spark, range(1_000)), small, n_buckets=16)
    append_epoch(_mk_batch(spark, range(200_000)), big, n_buckets=16)

    def timed(state):
        t0 = time.time()
        append_epoch(
            _mk_batch(spark, range(2_000), base_event_id=10_000_000,
                      commit_ms=9_000_000),
            state, n_buckets=16,
        )
        return time.time() - t0

    t_small, t_big = timed(small), timed(big)
    # identical work modulo noise; the eager merge is >10x apart here
    assert t_big < t_small * 3 + 0.5, (t_small, t_big)


def test_compaction_crash_window_is_harmless(spark, tmp_path):
    """The claimed crash-safety: a crash BETWEEN writing the compacted
    file and unlinking the superseded ones leaves both on disk —
    duplicates the idempotent reducer must collapse. Simulated by
    copying a bucket's files back after compaction."""
    import shutil

    state = str(tmp_path / "state")
    for e in range(4):
        append_epoch(
            _mk_batch(spark, range(20), base_event_id=100 * e,
                      commit_ms=1_000 * (e + 1)),
            state, n_buckets=2,
        )
    want = {
        (r["key"], r["event_id"])
        for r in read_latest(spark, state).collect()
    }
    # snapshot a bucket's pre-compaction files
    from scylla_pg_cdc_spark.streaming.pipeline import _bucket_dirs

    b, entry = next(iter(_bucket_dirs(state).items()))
    bdir = os.path.join(state, entry)
    stash = str(tmp_path / "stash")
    shutil.copytree(bdir, stash)
    compact_buckets(spark, state, [b])
    # "crash": the old files come back alongside the compacted file
    for f in os.listdir(stash):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(stash, f), os.path.join(bdir, f))
    got = {
        (r["key"], r["event_id"])
        for r in read_latest(spark, state).collect()
    }
    assert got == want
    # and the next compaction clears the duplicates for good
    compact_buckets(spark, state, [b])
    assert {
        (r["key"], r["event_id"])
        for r in read_latest(spark, state).collect()
    } == want


def test_eager_merge_over_lsm_layout_interops(spark, tmp_path):
    """Mode switching: an eager merge epoch applied to an LSM-written
    state dir must give the same live view — the merge's compaction
    absorbs the delta duplicates in the buckets it touches, and
    latest_state's merge-on-read covers the rest."""
    from scylla_pg_cdc_spark.streaming.pipeline import (
        latest_state,
        merge_batch_into_state,
    )

    state = str(tmp_path / "state")
    e1 = _mk_batch(spark, range(60), commit_ms=1_000)
    e2 = _mk_batch(spark, range(30), base_event_id=500, commit_ms=2_000)
    append_epoch(e1, state, n_buckets=8)
    append_epoch(e2, state, n_buckets=8)
    e3 = _mk_batch(spark, range(10), base_event_id=900, commit_ms=3_000)
    merge_batch_into_state(e3, state, n_buckets=8)  # eager epoch on top
    got = {
        (r["key"], r["event_id"])
        for r in latest_state(spark, state).collect()
    }
    want = {
        (r["key"], r["event_id"])
        for r in compact_latest_agg(
            e1.unionByName(e2).unionByName(e3), keep_deleted=True
        ).filter(F.col("op") != "DELETE").collect()
    }
    assert got == want


def test_parallel_compaction_matches_serial(spark, tmp_path):
    """`compact_buckets_parallel` (the standalone compactor's one-job
    path) produces the same merged state as the inline per-bucket loop
    and leaves non-target buckets' files untouched."""
    serial = str(tmp_path / "serial")
    par = str(tmp_path / "par")
    epochs = []
    for e in range(10):
        b = _mk_batch(
            spark, range(60), base_event_id=1000 * e, commit_ms=1_000 * (e + 1)
        )
        epochs.append(b)
        for state in (serial, par):
            append_epoch(b, state, n_buckets=8)

    todo = buckets_needing_compaction(par, file_threshold=4)
    assert len(todo) >= 2  # exercise real bucket parallelism
    spared = sorted(set(range(8)) - set(todo)) or [todo.pop()]
    untouched_before = {
        b: sorted(os.listdir(os.path.join(par, f"__bucket={b}")))
        for b in spared
    }

    compact_buckets(spark, serial, todo)
    compact_buckets_parallel(spark, par, todo)

    for b in spared:
        assert (
            sorted(os.listdir(os.path.join(par, f"__bucket={b}")))
            == untouched_before[b]
        ), f"bucket {b} was not a target but its files changed"
    for b in todo:
        n = sum(
            1
            for f in os.listdir(os.path.join(par, f"__bucket={b}"))
            if f.endswith(".parquet")
        )
        assert n == 1, f"bucket {b} not compacted to one file ({n})"

    got_serial = {
        (r["key"], r["event_id"], r["op"])
        for r in read_latest(spark, serial).collect()
    }
    got_par = {
        (r["key"], r["event_id"], r["op"])
        for r in read_latest(spark, par).collect()
    }
    want = {
        (r["key"], r["event_id"], r["op"]) for r in _want_rows(spark, epochs)
    }
    assert got_par == got_serial == want


def test_compaction_safe_beside_racing_append(spark, tmp_path):
    """The standalone compactor's claimed safety property: an append
    that lands AFTER the compactor listed its victim files (but before
    it finishes) is never lost — the compactor only unlinks files it
    listed at start, and duplicates collapse under the idempotent
    reducer. Simulated by interleaving: list -> racing append ->
    compact with the stale list."""
    state = str(tmp_path / "state")
    epochs = []
    for e in range(6):
        b = _mk_batch(
            spark, range(50), base_event_id=1000 * e, commit_ms=1_000 * (e + 1)
        )
        epochs.append(b)
        append_epoch(b, state, n_buckets=4)

    todo = buckets_needing_compaction(state, file_threshold=3)
    assert todo
    # the compactor would list victims now; a racing epoch lands first
    racer = _mk_batch(
        spark, range(25), base_event_id=9_000, commit_ms=99_000
    )
    epochs.append(racer)
    append_epoch(racer, state, n_buckets=4)
    # compact with the todo list computed BEFORE the racer arrived
    compact_buckets_parallel(spark, state, todo)

    got = {
        (r["key"], r["event_id"], r["op"])
        for r in read_latest(spark, state).collect()
    }
    assert got == {
        (r["key"], r["event_id"], r["op"]) for r in _want_rows(spark, epochs)
    }


def test_append_inside_compaction_unlink_window(spark, tmp_path):
    """An epoch that lands AFTER the compactor snapshotted its victim
    list and read the data, but BEFORE it unlinked the superseded
    files, must survive intact: the new delta file is not in the
    victim list, so unlink cannot touch it, and merge-on-read folds it
    in. This is the exact live-appender-beside-compactor race
    (deterministically pinned via the _before_unlink seam)."""
    state = str(tmp_path / "state")
    epochs = []
    for e in range(6):
        b = _mk_batch(
            spark, range(50), base_event_id=1000 * e, commit_ms=1_000 * (e + 1)
        )
        epochs.append(b)
        append_epoch(b, state, n_buckets=4)

    todo = buckets_needing_compaction(state, file_threshold=3)
    assert todo

    def racing_append():
        racer = _mk_batch(
            spark, range(25), base_event_id=9_000, commit_ms=99_000
        )
        epochs.append(racer)
        append_epoch(racer, state, n_buckets=4)

    compact_buckets_parallel(spark, state, todo, _before_unlink=racing_append)

    got = {
        (r["key"], r["event_id"], r["op"])
        for r in read_latest(spark, state).collect()
    }
    assert got == {
        (r["key"], r["event_id"], r["op"]) for r in _want_rows(spark, epochs)
    }


def test_live_appender_thread_beside_compaction_loop(spark, tmp_path):
    """Full-interleaving smoke: a background thread appends epochs
    while the foreground repeatedly compacts whatever crosses the file
    threshold. Whatever the interleaving, the final merge-on-read view
    must equal the latest-per-key reduction of everything appended."""
    import threading

    state = str(tmp_path / "state")
    # base epoch so the compactor always has something to chew on
    first = _mk_batch(spark, range(40), base_event_id=0, commit_ms=1_000)
    append_epoch(first, state, n_buckets=4)
    epochs = [first]
    appended = []  # thread-built; joined before use
    errs = []

    def appender():
        try:
            for e in range(1, 9):
                b = _mk_batch(
                    spark,
                    range(40),
                    base_event_id=1000 * e,
                    commit_ms=1_000 * (e + 1),
                )
                appended.append(b)
                append_epoch(b, state, n_buckets=4)
        except Exception as exc:  # pragma: no cover - surfaced below
            errs.append(exc)

    t = threading.Thread(target=appender)
    t.start()
    for _ in range(5):
        todo = buckets_needing_compaction(state, file_threshold=2)
        compact_buckets_parallel(spark, state, todo)
    t.join()
    assert not errs
    # one more pass so the final state is compacted too
    compact_buckets_parallel(
        spark, state, buckets_needing_compaction(state, file_threshold=2)
    )
    epochs.extend(appended)

    got = {
        (r["key"], r["event_id"], r["op"])
        for r in read_latest(spark, state).collect()
    }
    assert got == {
        (r["key"], r["event_id"], r["op"]) for r in _want_rows(spark, epochs)
    }
