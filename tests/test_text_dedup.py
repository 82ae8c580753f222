"""Cross-validation of the three near-dup detectors: expression
MinHash+LSH, spark.ml MinHashLSH, and exact n-gram Jaccard must agree
on the planted near-duplicate pairs (J ~ 0.99) in the corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.operators.text import (
    lsh_candidate_pairs,
    minhash_signatures,
    ml_minhash_neardup_pairs,
    q_text_ngram_jaccard,
    shingles,
)
from scylla_pg_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def true_pairs(spark):
    rows = q_text_ngram_jaccard(spark, SF_SMALL).collect()
    strong = {
        (r["doc_a"], r["doc_b"]) for r in rows if r["jaccard"] > 0.9
    }
    assert len(strong) >= 10, "corpus should contain planted near-dups"
    return strong


def test_expression_minhash_recalls_true_pairs(spark, true_pairs):
    docs = load_table(spark, SF_SMALL, "documents")
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(minhash_signatures(shingles(docs))).collect()
    }
    recall = len(true_pairs & cands) / len(true_pairs)
    assert recall >= 0.9, f"expression LSH recall too low: {recall}"


def test_ml_minhash_recalls_true_pairs(spark, true_pairs):
    docs = load_table(spark, SF_SMALL, "documents")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in ml_minhash_neardup_pairs(docs).collect()
    }
    recall = len(true_pairs & got) / len(true_pairs)
    assert recall >= 0.9, f"ml MinHashLSH recall too low: {recall}"


def test_ml_minhash_distance_calibration(spark, true_pairs):
    """For planted pairs (true J ~ 0.99) the reported jaccard distance
    must be small."""
    docs = load_table(spark, SF_SMALL, "documents")
    pairs = ml_minhash_neardup_pairs(docs)
    strong = pairs.filter(F.col("jaccard_dist") < 0.2).count()
    assert strong >= len(true_pairs) * 0.9


def test_dedup_cluster_resolution(spark, true_pairs):
    """Label propagation must group every planted near-dup pair into
    one cluster with exactly one canonical (min doc_id) survivor."""
    from pyspark.sql import functions as F

    from scylla_pg_cdc_spark.operators.text import resolve_dedup_clusters

    docs = load_table(spark, SF_SMALL, "documents")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in sorted(true_pairs)], "doc_a long, doc_b long"
    )
    clusters = resolve_dedup_clusters(pairs, docs)
    by_doc = {r["doc_id"]: r for r in clusters.collect()}
    # every pair ends in the same cluster
    for a, b in true_pairs:
        assert by_doc[a]["cluster_id"] == by_doc[b]["cluster_id"], (a, b)
        assert by_doc[a]["cluster_id"] == min(
            x for x, r in by_doc.items()
            if r["cluster_id"] == by_doc[a]["cluster_id"]
        )
    # exactly one canonical per cluster; non-paired docs are singletons
    from collections import Counter

    canon = Counter(
        r["cluster_id"] for r in by_doc.values() if r["is_canonical"]
    )
    assert all(v == 1 for v in canon.values())
    assert len(by_doc) == docs.count()


def test_dedup_cluster_transitive_chain(spark):
    """a-b and b-c (no a-c edge) must still merge into one cluster."""
    from scylla_pg_cdc_spark.operators.text import resolve_dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 2)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in resolve_dedup_clusters(pairs, docs).collect()
    }
    assert got == {0: 0, 3: 0, 5: 0, 1: 1, 2: 1, 4: 4}


def test_decontaminate_strategy_switch_same_answer(spark):
    """The broadcast and shuffled-semi-join paths of `decontaminate`
    are the same logical plan with different physical joins — forcing
    the shuffle path (budget=0) must not change a single flag, and the
    flagged set must shrink monotonically as the shingle k grows."""
    from scylla_pg_cdc_spark.operators.sampling import decontaminate
    from scylla_pg_cdc_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").limit(300)
    train = docs.filter(F.col("doc_id") % 10 < 8)
    ev = docs.filter(F.col("doc_id") % 10 >= 8)

    def flags(k, budget):
        return {
            (r["doc_id"], r["contaminated"])
            for r in decontaminate(
                train, ev, k=k, broadcast_row_budget=budget
            ).collect()
        }

    bcast = flags(3, 5_000_000)
    shuffled = flags(3, 0)
    assert bcast == shuffled
    n3 = sum(1 for _, c in bcast if c)
    n6 = sum(1 for _, c in flags(6, 5_000_000) if c)
    assert n3 > 0  # synthetic corpus has shared trigrams
    assert n6 <= n3  # longer shingles can only reduce matches
