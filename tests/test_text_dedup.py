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
