"""Round-7 operator tests: the prefix-filtered exact shingle
similarity family (the scale-safe twins of the shared-shingle naive
verifiers, VERDICT r6 next-round #2) checked against serial Python
recomputations, plus the identity between the scaled and naive LSH
precision/recall metrics."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from scylla_pg_cdc_spark.operators.text import (
    confirmed_neardup_pairs,
    prefix_containment_pairs,
    prefix_jaccard_pairs,
    shingles,
)
from scylla_pg_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def _shingle_sets(spark):
    """doc_id -> distinct 3-token shingle set, replicating shingles()
    serially (split on single spaces, docs with >= 3 tokens, empty
    shingles dropped)."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    out = {}
    for r in docs.collect():
        toks = r["text"].split(" ")
        if len(toks) < 3:
            continue
        s = {
            " ".join(toks[i : i + 3])
            for i in range(len(toks) - 2)
        }
        s.discard("")
        out[r["doc_id"]] = s
    return out


def _serial_pairs(sets):
    """(a, b) -> (n_common, n_a, n_b) over ALL shingle-sharing pairs."""
    out = {}
    for a, b in combinations(sorted(sets), 2):
        c = len(sets[a] & sets[b])
        if c:
            out[(a, b)] = (c, len(sets[a]), len(sets[b]))
    return out


def test_prefix_jaccard_pairs_exact_and_lossless(spark):
    sets = _shingle_sets(spark)
    serial = _serial_pairs(sets)
    sh = shingles(load_table(spark, SF_SMALL, "documents"), k=3)
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["n_a"], r["n_b"])
        for r in prefix_jaccard_pairs(sh, 8, 10).collect()
    }
    # every emitted row carries the EXACT serial counts
    for pair, counts in got.items():
        assert serial[pair] == counts, pair
    # and the pair set covers every true J >= 0.8 pair (losslessness)
    want = {
        p
        for p, (c, na, nb) in serial.items()
        if 10 * c >= 8 * (na + nb - c)
    }
    assert want and want <= set(got)


def test_prefix_containment_pairs_exact_and_lossless(spark):
    sets = _shingle_sets(spark)
    serial = _serial_pairs(sets)
    sh = shingles(load_table(spark, SF_SMALL, "documents"), k=3)
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["n_a"], r["n_b"])
        for r in prefix_containment_pairs(sh, 4, 5).collect()
    }
    for pair, counts in got.items():
        assert serial[pair] == counts, pair
    want = {
        p
        for p, (c, na, nb) in serial.items()
        if 5 * c >= 4 * min(na, nb)
    }
    assert want and want <= set(got)


def test_confirmed_neardup_pairs_match_serial(spark):
    sets = _shingle_sets(spark)
    serial = _serial_pairs(sets)
    want = {
        p
        for p, (c, na, nb) in serial.items()
        if c * 1.0 / (na + nb - c) > 0.8
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in confirmed_neardup_pairs(spark, SF_SMALL).collect()
    }
    assert got == want and len(got) > 0


def test_scaled_lsh_pr_identical_to_naive(spark):
    from scylla_pg_cdc_spark.operators.text import (
        q_lsh_precision_recall,
        q_lsh_precision_recall_scaled,
    )

    naive = q_lsh_precision_recall(spark, SF_SMALL).collect()[0]
    scaled = q_lsh_precision_recall_scaled(spark, SF_SMALL).collect()[0]
    assert naive.asDict() == scaled.asDict()
    assert scaled["n_true"] > 0


def test_prefix_filter_survives_boilerplate(spark):
    """Semantics under injected Zipfian boilerplate: every doc shares
    a 12-token header (the hot-shingle shape that makes the naive
    self-join quadratic); the prefix join must still return exactly
    the serial pair set at J >= 0.5."""
    header = " ".join(f"hdr{i}" for i in range(12))
    rows = [
        (i, f"{header} unique{i}a unique{i}b unique{i}c unique{i}d")
        for i in range(40)
    ]
    # two genuine near-dups: identical tails
    rows.append((100, f"{header} same tail tokens here now"))
    rows.append((101, f"{header} same tail tokens here now extra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(docs, k=3)
    sets = {}
    for i, text in rows:
        toks = text.split(" ")
        sets[i] = {
            " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
        }
    serial = _serial_pairs(sets)
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["n_a"], r["n_b"])
        for r in prefix_jaccard_pairs(sh, 1, 2).collect()
    }
    for pair, counts in got.items():
        assert serial[pair] == counts, pair
    want = {
        p
        for p, (c, na, nb) in serial.items()
        if 2 * c >= (na + nb - c)
    }
    assert (100, 101) in want and want <= set(got)


def test_drift_fold_recovers_interrupted_swap(spark, tmp_path):
    """Crash window between the swap's renames (ADVICE r6): with
    ``counts`` missing and only ``counts_prev`` committed, the next
    NEW-marker fold must first restore the live dir — same reports as
    an uninterrupted twin, and no silent bootstrap losing history."""
    import os

    from scylla_pg_cdc_spark.streaming.drift_state import monitor_epoch

    ev = load_table(spark, SF_SMALL, "events")
    epochs = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    outs_a, outs_b = [], []
    for i, e in enumerate(epochs):
        outs_a.append(
            sorted(
                map(tuple, monitor_epoch(spark, a, e, f"m{i}").collect())
            )
        )
        if i == 1:
            # simulate the crash: live dir renamed away, promote of
            # counts_next never happened (next is stale garbage)
            os.rename(
                os.path.join(b, "counts"), os.path.join(b, "counts_prev")
            )
        outs_b.append(
            sorted(
                map(tuple, monitor_epoch(spark, b, e, f"m{i}").collect())
            )
        )
    assert outs_a == outs_b
    assert any(outs_a[2]), "epoch 3 produced no drift rows"
    assert not os.path.isdir(os.path.join(b, "counts_prev"))
