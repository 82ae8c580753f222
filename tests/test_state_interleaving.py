"""Property-based compactor-vs-appender interleaving harness
(VERDICT r7 next-round #4): randomized admit / compact / crash
sequences over the dedup state store and the drift monitor, with the
crash simulations drawn from every commit point the protocols expose
— admit-without-marker then replay, compacted-dir staged without a
manifest, injected crash between the pre-swap drain and the manifest
swap, drift swap interrupted between its two renames. The invariant
under EVERY interleaving: admission decisions / KS reports identical
to a crash-free serial baseline, and the final state contains exactly
the admitted corpus once.

Seeds are recorded here (failures print the seed); extend SEEDS to
widen the search, never shrink it."""

from __future__ import annotations

import os
import random
import shutil

import pytest
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.sources.tables import load_table
from scylla_pg_cdc_spark.streaming.dedup_state import (
    _state_parts,
    admit_epoch,
    compact_dedup_state,
)
from scylla_pg_cdc_spark.streaming.drift_state import monitor_epoch
from tests.conftest import SF_SMALL

SEEDS = [11, 23, 47]
N_EPOCHS = 5

_MEMO: dict = {}


def _epochs(spark):
    full = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    return [
        full.filter(F.col("doc_id") % N_EPOCHS == i) for i in range(N_EPOCHS)
    ]


def _dedup_baseline(spark, tmp_path) -> dict:
    """Crash-free serial admission (no compactor anywhere) — computed
    once per session; the epoch split is deterministic so every seed
    compares against the same truth."""
    if "dedup" not in _MEMO:
        base = str(tmp_path / "baseline")
        want = {}
        for i, e in enumerate(_epochs(spark)):
            for r in admit_epoch(
                spark, base, e, marker=f"epoch-{i}"
            ).collect():
                want[r["doc_id"]] = (r["is_new"], r["n_matches"])
            with open(os.path.join(base, "_EPOCH"), "w") as f:
                f.write(f"epoch-{i}")
        _MEMO["dedup"] = want
    return _MEMO["dedup"]


def _crash_swap_compact(spark, state: str) -> None:
    """Run the compactor with a crash injected at the manifest swap —
    everything before the commit point (staged compacted dir, the
    PRE-swap drain of the previous generation's pending_delete list)
    has happened, the manifest has not changed."""
    orig = os.replace

    def boom(src, dst):
        if str(dst).endswith("_COMPACTION"):
            raise RuntimeError("injected crash at manifest swap")
        return orig(src, dst)

    os.replace = boom
    try:
        compact_dedup_state(spark, state, min_parts=2)
    except RuntimeError:
        pass
    finally:
        os.replace = orig


@pytest.mark.parametrize("seed", SEEDS)
def test_dedup_interleaving_decisions_invariant(spark, tmp_path, seed):
    want = _dedup_baseline(spark, tmp_path)
    rng = random.Random(seed)
    state = str(tmp_path / f"s{seed}")
    got: dict = {}
    orphan_n = 0
    for i, e in enumerate(_epochs(spark)):
        marker = f"epoch-{i}"
        if rng.random() < 0.4:
            # crash before the marker commit: the admit ran fully but
            # _EPOCH was never written — the pipeline replays it
            first = {
                r["doc_id"]: (r["is_new"], r["n_matches"])
                for r in admit_epoch(spark, state, e, marker=marker).collect()
            }
        else:
            first = None
        dec = {
            r["doc_id"]: (r["is_new"], r["n_matches"])
            for r in admit_epoch(spark, state, e, marker=marker).collect()
        }
        if first is not None:
            assert dec == first, f"seed {seed}: replay diverged at {marker}"
        got.update(dec)
        with open(os.path.join(state, "_EPOCH"), "w") as f:
            f.write(marker)
        # the external compactor (and its crashes) fires between
        # committed epochs — the concurrency contract's window
        for _ in range(rng.randint(0, 2)):
            action = rng.choice(["compact", "orphan", "crash_swap", "noop"])
            if action == "compact":
                compact_dedup_state(spark, state, min_parts=2)
            elif action == "crash_swap":
                _crash_swap_compact(spark, state)
            elif action == "orphan":
                # compacted dir staged, manifest never swapped
                src_parts = _state_parts(state, "buckets", None)
                if src_parts:
                    orphan_n += 1
                    for sub in ("buckets", "tokens"):
                        sp = _state_parts(state, sub, None)[0]
                        shutil.copytree(
                            sp,
                            os.path.join(
                                state, sub, f"compacted-0009{orphan_n:02d}"
                            ),
                        )
    assert got == want, f"seed {seed}: decisions diverged"
    assert any(not v[0] for v in want.values())
    # final state = exactly the admitted corpus, each doc ONCE (no
    # double-visibility through any manifest/dir combination)
    parts = _state_parts(state, "tokens", None)
    rows = [
        r["doc_id"]
        for p in parts
        for r in spark.read.parquet(p).select("doc_id").collect()
    ]
    admitted = {d for d, (is_new, _n) in want.items() if is_new}
    assert len(rows) == len(set(rows)), f"seed {seed}: doc visible twice"
    assert set(rows) == admitted, f"seed {seed}: state corpus diverged"


def _drift_epochs(spark):
    ev = load_table(spark, SF_SMALL, "events").select("event_type", "value")
    return [
        ev.filter(F.pmod(F.xxhash64("value"), F.lit(4)) == i)
        for i in range(4)
    ]


def _drift_baseline(spark, tmp_path) -> list:
    if "drift" not in _MEMO:
        base = str(tmp_path / "drift_baseline")
        reports = []
        for i, e in enumerate(_drift_epochs(spark)):
            out = monitor_epoch(spark, base, e, marker=f"epoch-{i}")
            reports.append(sorted(tuple(r) for r in out.collect()))
        _MEMO["drift"] = reports
    return _MEMO["drift"]


@pytest.mark.parametrize("seed", SEEDS)
def test_drift_interleaving_reports_invariant(spark, tmp_path, seed):
    want = _drift_baseline(spark, tmp_path)
    rng = random.Random(seed)
    state = str(tmp_path / f"d{seed}")
    cdir = os.path.join(state, "counts")
    for i, e in enumerate(_drift_epochs(spark)):
        marker = f"epoch-{i}"
        action = rng.choice(["clean", "half_swap", "stale_next", "replay"])
        if action == "half_swap" and os.path.isdir(cdir):
            # crash between the swap's two renames: _prev is the only
            # committed dir (the ADVICE r6 recovery path)
            os.rename(cdir, cdir + "_prev")
        elif action == "stale_next":
            # crash after staging the merged counts, before any rename
            os.makedirs(cdir + "_next", exist_ok=True)
            with open(os.path.join(cdir + "_next", "junk"), "w") as f:
                f.write("partial write")
        out = sorted(
            tuple(r)
            for r in monitor_epoch(spark, state, e, marker=marker).collect()
        )
        assert out == want[i], f"seed {seed}: report diverged at {marker}"
        if action == "replay":
            replay = sorted(
                tuple(r)
                for r in monitor_epoch(
                    spark, state, e, marker=marker
                ).collect()
            )
            assert replay == want[i], (
                f"seed {seed}: replayed report diverged at {marker}"
            )
