"""Streaming dedup-admission pipeline: the foreachBatch face of
streaming/dedup_state.py. Proves (1) per-file epochs through
run_dedup_pipeline equal a serial pure-Python greedy replay in the
stream's own epoch order, and (2) crash-replaying an epoch with the
same marker is idempotent — identical decisions, no state growth."""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import functions as F

from scylla_pg_cdc_spark.sources.tables import load_table
from scylla_pg_cdc_spark.streaming.dedup_state import (
    admit_epoch,
    read_decisions,
    run_dedup_pipeline,
)
from tests.conftest import SF_SMALL


def _features(text: str):
    """Pure-Python mirror of _batch_features: (band buckets, token
    set) — same 3-shingles, 2x4 minhash, 4 bands as operators/text."""
    toks = text.split(" ")
    sh = {
        " ".join(toks[i : i + 3])
        for i in range(len(toks) - 2)
        if " ".join(toks[i : i + 3])
    }
    tokset = {t for t in toks if t}
    if not sh:
        return set(), tokset
    sig = []
    for salt in ("0:", "1:"):
        digs = [hashlib.md5((salt + s).encode()).hexdigest() for s in sh]
        for j in range(4):
            sig.append(min(d[j * 8 : j * 8 + 8] for d in digs))
    bkts = {
        (
            b,
            hashlib.md5(
                (sig[2 * b] + "|" + sig[2 * b + 1]).encode()
            ).hexdigest(),
        )
        for b in range(4)
    }
    return bkts, tokset


def _serial_admit(epochs: list[list[int]], feat: dict):
    """Greedy replay: each epoch checked only against previously
    ADMITTED docs; returns {doc_id: (is_new, n_matches)}."""
    admitted: dict[int, tuple] = {}
    want: dict[int, tuple] = {}
    for epoch_ids in epochs:
        newly = []
        for d in sorted(epoch_ids):
            bk, tk = feat[d]
            n_matches = 0
            for _c, (cbk, ctk) in admitted.items():
                if bk & cbk:
                    inter = len(tk & ctk)
                    union = len(tk) + len(ctk) - inter
                    if 10 * inter >= 9 * union:
                        n_matches += 1
            want[d] = (n_matches == 0, n_matches)
            if n_matches == 0:
                newly.append(d)
        for d in newly:
            admitted[d] = feat[d]
    return want


def _split_docs_dir(spark, tmp_path, n_splits: int = 3) -> str:
    full = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    )
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    for i in range(n_splits):
        stage = tmp_path / f"stage{i}"
        full.filter(F.col("doc_id") % n_splits == i).coalesce(
            1
        ).write.parquet(str(stage))
        part = next(
            p for p in stage.iterdir() if p.name.endswith(".parquet")
        )
        shutil.copy(part, docs_dir / f"{i:03d}.parquet")
    return str(docs_dir)


def test_dedup_pipeline_streaming_matches_serial(spark, tmp_path):
    docs_dir = _split_docs_dir(spark, tmp_path)
    out = run_dedup_pipeline(spark, docs_dir, str(tmp_path / "work"))

    rows = read_decisions(spark, out["decisions"]).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMALL, "documents").collect()
    }
    assert {r["doc_id"] for r in rows} == set(docs)
    epoch_ids = sorted({r["epoch_id"] for r in rows})
    assert len(epoch_ids) == 3, "expected one epoch per file"

    # replay serially in the stream's OWN epoch order
    feat = {d: _features(t) for d, t in docs.items()}
    epochs = [
        [r["doc_id"] for r in rows if r["epoch_id"] == e]
        for e in epoch_ids
    ]
    want = _serial_admit(epochs, feat)
    got = {r["doc_id"]: (r["is_new"], r["n_matches"]) for r in rows}
    assert got == want
    assert any(not v[0] for v in want.values()), (
        "no rejections across epochs - greedy path never exercised"
    )

    # availableNow restart with the same checkpoint: no new epochs,
    # decisions and state unchanged
    state_subdirs = sorted(os.listdir(os.path.join(out["state"], "buckets")))
    run_dedup_pipeline(spark, docs_dir, str(tmp_path / "work"))
    rows2 = read_decisions(spark, out["decisions"]).collect()
    assert {
        r["doc_id"]: (r["is_new"], r["n_matches"], r["epoch_id"])
        for r in rows2
    } == {
        r["doc_id"]: (r["is_new"], r["n_matches"], r["epoch_id"])
        for r in rows
    }
    assert (
        sorted(os.listdir(os.path.join(out["state"], "buckets")))
        == state_subdirs
    )


def test_admit_epoch_marker_replay_idempotent(spark, tmp_path):
    full = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    )
    state = str(tmp_path / "state")
    e0 = full.filter(F.col("doc_id") % 3 == 0)
    e1 = full.filter(F.col("doc_id") % 3 == 1)
    admit_epoch(spark, state, e0, marker="epoch-0").collect()
    d1 = {
        r["doc_id"]: (r["is_new"], r["n_matches"])
        for r in admit_epoch(spark, state, e1, marker="epoch-1").collect()
    }
    # crash-replay epoch-1: the read must exclude epoch-1's own partial
    # state, so decisions are identical and no subdir is added
    d1r = {
        r["doc_id"]: (r["is_new"], r["n_matches"])
        for r in admit_epoch(spark, state, e1, marker="epoch-1").collect()
    }
    assert d1r == d1
    assert sorted(os.listdir(os.path.join(state, "buckets"))) == [
        "epoch-0",
        "epoch-1",
    ]
    assert any(not v[0] for v in d1.values()), (
        "epoch-1 rejected nothing - replay test never hit the join path"
    )


def test_compaction_interleaved_with_live_appender(spark, tmp_path):
    """Compacting between epochs must not change any admission
    decision: run A = epochs with compaction after each, run B =
    untouched baseline — identical decisions, and the compacted run's
    state collapses to one generation directory."""
    from scylla_pg_cdc_spark.streaming.dedup_state import (
        compact_dedup_state,
    )

    full = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    )
    eps = [full.filter(F.col("doc_id") % 4 == i) for i in range(4)]

    base = str(tmp_path / "base")
    comp = str(tmp_path / "comp")
    want, got = {}, {}
    for i, e in enumerate(eps):
        for r in admit_epoch(spark, base, e, marker=f"epoch-{i}").collect():
            want[r["doc_id"]] = (r["is_new"], r["n_matches"])
        for r in admit_epoch(spark, comp, e, marker=f"epoch-{i}").collect():
            got[r["doc_id"]] = (r["is_new"], r["n_matches"])
        # background compactor fires BETWEEN live epochs (epoch-i is
        # committed once admit_epoch returned)
        with open(os.path.join(comp, "_EPOCH"), "w") as f:
            f.write(f"epoch-{i}")
        res = compact_dedup_state(spark, comp)
        if i >= 1:
            assert res["merged"], f"epoch {i}: nothing merged"
    assert got == want
    assert any(not v[0] for v in want.values())
    # gen-3's inputs survive the commit by ONE generation (deferred
    # deletion: a stale-manifest reader may still scan them), but the
    # LIVE view is the single latest generation
    from scylla_pg_cdc_spark.streaming.dedup_state import _state_parts

    live = [os.path.basename(p) for p in _state_parts(comp, "buckets", None)]
    assert live == ["compacted-000003"], live
    subdirs = sorted(os.listdir(os.path.join(comp, "buckets")))
    assert subdirs == [
        "compacted-000002", "compacted-000003", "epoch-3",
    ], subdirs
    # a later no-merge compactor pass does NOT drain yet: the
    # committed epoch hasn't advanced past the delisting commit, so an
    # admit that loaded the pre-commit manifest could still be
    # mid-scan (ADVICE r7 — the drain used to fire unconditionally)
    res = compact_dedup_state(spark, comp)
    assert res["merged"] == []
    subdirs = sorted(os.listdir(os.path.join(comp, "buckets")))
    assert subdirs == [
        "compacted-000002", "compacted-000003", "epoch-3",
    ], subdirs
    # once one more epoch commits, the same pass drains the deferred
    # deletions; exactly one generation dir remains
    with open(os.path.join(comp, "_EPOCH"), "w") as f:
        f.write("epoch-4")
    res = compact_dedup_state(spark, comp)
    assert res["merged"] == []
    subdirs = sorted(os.listdir(os.path.join(comp, "buckets")))
    assert subdirs == ["compacted-000003"], subdirs


def test_compaction_crash_before_manifest_is_invisible(spark, tmp_path):
    """A compacted-* directory staged on disk WITHOUT a manifest entry
    (crash before the atomic manifest swap) must be ignored by
    readers: decisions identical to the pre-crash state, and the next
    compactor run supersedes the orphan."""
    import shutil as _sh

    from scylla_pg_cdc_spark.streaming.dedup_state import (
        _state_parts,
        compact_dedup_state,
    )

    full = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    )
    state = str(tmp_path / "state")
    e0 = full.filter(F.col("doc_id") % 3 == 0)
    e1 = full.filter(F.col("doc_id") % 3 == 1)
    e2 = full.filter(F.col("doc_id") % 3 == 2)
    admit_epoch(spark, state, e0, marker="epoch-0").collect()
    admit_epoch(spark, state, e1, marker="epoch-1").collect()
    with open(os.path.join(state, "_EPOCH"), "w") as f:
        f.write("epoch-1")
    # simulate the crash: stage a bogus compacted dir with REAL parquet
    # (a partial merge) but never swap the manifest
    for sub in ("buckets", "tokens"):
        src = os.path.join(state, sub, "epoch-0")
        _sh.copytree(src, os.path.join(state, sub, "compacted-000099"))
    visible = [
        os.path.basename(p) for p in _state_parts(state, "buckets", None)
    ]
    assert "compacted-000099" not in visible
    d2 = {
        r["doc_id"]: (r["is_new"], r["n_matches"])
        for r in admit_epoch(spark, state, e2, marker="epoch-2").collect()
    }
    # clean-state reference (no orphan): identical decisions
    ref = str(tmp_path / "ref")
    admit_epoch(spark, ref, e0, marker="epoch-0").collect()
    admit_epoch(spark, ref, e1, marker="epoch-1").collect()
    d2_ref = {
        r["doc_id"]: (r["is_new"], r["n_matches"])
        for r in admit_epoch(spark, ref, e2, marker="epoch-2").collect()
    }
    assert d2 == d2_ref
    assert any(not v[0] for v in d2.values())


def test_compaction_epoch_compare_is_numeric(spark, tmp_path):
    """Unpadded markers: with committed marker 'epoch-9', a
    lexicographic guard would treat 'epoch-10' <= 'epoch-9' as
    committed and merge (then delete) the in-flight epoch dir; the
    numeric compare must merge epoch-9 only (ADVICE r6)."""
    from scylla_pg_cdc_spark.streaming.dedup_state import (
        _state_parts,
        compact_dedup_state,
    )

    full = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    )
    state = str(tmp_path / "state")
    admit_epoch(
        spark, state, full.filter(F.col("doc_id") % 2 == 0),
        marker="epoch-9",
    ).collect()
    # epoch-10 is ON DISK but NOT committed (its admit is "in flight":
    # no _EPOCH update)
    admit_epoch(
        spark, state, full.filter(F.col("doc_id") % 2 == 1),
        marker="epoch-10",
    ).collect()
    with open(os.path.join(state, "_EPOCH"), "w") as f:
        f.write("epoch-9")
    res = compact_dedup_state(spark, state, min_parts=1)
    assert res["merged"] == ["epoch-9"], res
    live = [os.path.basename(p) for p in _state_parts(state, "buckets", None)]
    assert "epoch-10" in live and "compacted-000001" in live


def test_pipeline_with_compaction_cadence_matches_baseline(
    spark, tmp_path
):
    """compact_every wires the cadenced compactor INTO the streaming
    pipeline (after each marker commit): decisions must equal the
    uncompacted pipeline's exactly, and the state's live read fan-in
    stays bounded by the threshold."""
    from scylla_pg_cdc_spark.streaming.dedup_state import _state_parts

    docs_dir = _split_docs_dir(spark, tmp_path, n_splits=4)
    base = run_dedup_pipeline(spark, docs_dir, str(tmp_path / "wb"))
    comp = run_dedup_pipeline(
        spark, docs_dir, str(tmp_path / "wc"), compact_every=2
    )
    key = lambda out: {  # noqa: E731
        r["doc_id"]: (r["is_new"], r["n_matches"], r["epoch_id"])
        for r in read_decisions(spark, out["decisions"]).collect()
    }
    assert key(comp) == key(base)
    live = _state_parts(comp["state"], "buckets", None)
    assert 0 < len(live) <= 2, live
    assert any(
        os.path.basename(p).startswith("compacted-") for p in live
    )
