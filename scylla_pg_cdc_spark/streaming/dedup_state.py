"""Cross-epoch near-dup dedup state: greedy LSH admission.

The batch query ``operators/text.py:q_neardup_incremental`` shows one
epoch's admission against a static corpus; this module is the
STATEFUL form a CDC-fed corpus actually runs: the admitted corpus's
LSH band buckets and token sets persist as partitioned parquet, each
incoming epoch joins ONLY against that state, and docs admitted by an
epoch immediately extend the state the next epoch sees — greedy
sequential dedup, the standard training-corpus admission policy
(first-seen doc wins; later near-copies are rejected).

Reference anchor: the same persist-then-merge epoch discipline as the
upsert pipeline's MV/digest state (`streaming/pipeline.py:275-380`);
the reference's own stateful sink is the Postgres upsert table
(`docker/kafka-connect/connectors/postgres-sink.json:22-24`).

Scale: per epoch the cost is O(batch) hashing + a bucket-keyed join
against state partitioned BY BUCKET PREFIX, so a 100 TB corpus's
state is touched only on matching buckets (partition pruning on the
join key); the exact-confirm join is bounded by LSH candidates. State
grows with the ADMITTED corpus only. The 9/10 token-Jaccard confirm
matches the batch query.

Determinism caveat (documented, also true of any parallel greedy
dedup): near-dup pairs WITHIN one epoch are both admitted (epoch
members are only checked against prior state, exactly like the batch
query); shrink the epoch or pre-collapse epochs with
``lsh_candidate_pairs`` when intra-epoch dups matter.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.operators.text import (
    banded_buckets,
    minhash_signatures,
    shingles,
)

_T_NUM, _T_DEN = 9, 10  # admit iff jaccard < 9/10 vs every state doc


def _batch_features(batch: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(buckets, token arrays) for an incoming epoch of (doc_id, text).

    Docs too short to shingle (< 3 tokens) get no buckets — they are
    always admitted, same as in the batch query."""
    bucket = banded_buckets(minhash_signatures(shingles(batch)))
    toks = (
        batch.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.length("token") > 0)
        .distinct()
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_set("token")).alias("toks"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return bucket, toks


def admit_epoch(
    spark: SparkSession, state_dir: str, batch: DataFrame
) -> DataFrame:
    """Admit one epoch of (doc_id, text) against the persisted state.

    Returns the admission frame (doc_id, is_new, n_matches) and
    appends the admitted docs' buckets + token arrays to the state.
    First epoch bootstraps the state (everything admitted)."""
    bdir = os.path.join(state_dir, "buckets")
    tdir = os.path.join(state_dir, "tokens")
    bucket_b, toks_b = _batch_features(batch)
    if not os.path.isdir(bdir):
        decisions = batch.select(
            "doc_id",
            F.lit(True).alias("is_new"),
            F.lit(0).cast("long").alias("n_matches"),
        )
    else:
        state_buckets = spark.read.parquet(bdir)
        state_toks = spark.read.parquet(tdir)
        cand = (
            bucket_b.alias("b")
            .join(
                state_buckets.alias("s"),
                (F.col("b.band") == F.col("s.band"))
                & (F.col("b.bucket") == F.col("s.bucket")),
            )
            .select(
                F.col("b.doc_id").alias("doc_n"),
                F.col("s.doc_id").alias("doc_c"),
            )
            .distinct()
        )
        matches = (
            cand.join(
                toks_b.select(
                    F.col("doc_id").alias("doc_n"),
                    F.col("toks").alias("toks_a"),
                    F.col("n").alias("n_a"),
                ),
                "doc_n",
            )
            .join(
                state_toks.select(
                    F.col("doc_id").alias("doc_c"),
                    F.col("toks").alias("toks_b"),
                    F.col("n").alias("n_b"),
                ),
                "doc_c",
            )
            .withColumn(
                "n_common",
                F.size(F.array_intersect("toks_a", "toks_b")).cast("long"),
            )
            .filter(
                F.lit(_T_DEN) * F.col("n_common")
                >= F.lit(_T_NUM)
                * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            )
            .groupBy(F.col("doc_n").alias("doc_id"))
            .agg(F.count(F.lit(1)).alias("n_matches"))
        )
        decisions = (
            batch.select("doc_id")
            .join(matches, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_matches", F.lit(0))
                .cast("long")
                .alias("n_matches"),
            )
            .withColumn("is_new", F.col("n_matches") == 0)
            .select("doc_id", "is_new", "n_matches")
        )
    admitted = decisions.filter(F.col("is_new")).select("doc_id")
    # appends are idempotent per epoch in the pipeline setting because
    # the caller wraps them in the checkpointed foreachBatch (same
    # discipline as merge_batch_into_state); here plain appends
    bucket_b.join(admitted, "doc_id").withColumn(
        "bp", F.substring("bucket", 1, 1)
    ).write.mode("append").partitionBy("bp").parquet(bdir)
    toks_b.join(admitted, "doc_id").write.mode("append").parquet(tdir)
    return decisions
