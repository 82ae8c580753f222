"""Resumable key-range reconciliation for very large tables.

The reference reconciles in LIMIT/OFFSET batches with JSON checkpoints
so an interrupted run resumes where it stopped
(`scripts/reconcile.py:100-188,378-413`). OFFSET pagination is
O(n²) on a 100 TB table; the Spark-native equivalent partitions the
keyspace by a *stable hash bucket* of the key and records completed
buckets in a progress parquet:

- each bucket's diff is an independent job over
  ``pmod(hash(key), n) = b`` — predicate-pushdown prunes both scans;
- the progress table is tiny (one row per finished bucket) and the
  unit of atomicity is one bucket (rewriting a partial bucket is
  idempotent: results are overwritten per-bucket);
- buckets can run serially (bounded memory) or be dispatched
  concurrently across clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.operators.reconcile import diff_datasets


def _bucket(keys: list[str], n_buckets: int):
    return F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(n_buckets))


def reconcile_resumable(
    spark: SparkSession,
    source: DataFrame,
    target: DataFrame,
    keys: list[str],
    work_dir: str,
    n_buckets: int = 16,
    fail_after_bucket: int | None = None,
) -> DataFrame:
    """Diff source vs target bucket-by-bucket with resume.

    ``fail_after_bucket`` injects a crash after N buckets (test hook
    mirroring the reference's restart/recovery tests,
    `tests/integration/test_failure_recovery.py:49-100`).
    Returns the combined diff of all buckets (match rows included).
    """
    progress_path = os.path.join(work_dir, "progress")
    results_path = os.path.join(work_dir, "diff")
    try:
        done = {
            r["bucket"]
            for r in spark.read.parquet(progress_path).collect()
        }
    except Exception:
        done = set()

    completed = 0
    for b in range(n_buckets):
        if b in done:
            continue
        if fail_after_bucket is not None and completed >= fail_after_bucket:
            raise RuntimeError(f"injected failure after {completed} buckets")
        src_b = source.filter(_bucket(keys, n_buckets) == b)
        tgt_b = target.filter(_bucket(keys, n_buckets) == b)
        diff_b = diff_datasets(src_b, tgt_b, keys).withColumn(
            "bucket", F.lit(b)
        ).withColumn("diff_fields", F.array_join("diff_fields", ","))
        diff_b.write.mode("overwrite").parquet(
            os.path.join(results_path, f"bucket={b}")
        )
        spark.createDataFrame([(b,)], "bucket int").write.mode("append").parquet(
            progress_path
        )
        completed += 1

    return spark.read.parquet(os.path.join(results_path, "bucket=*"))
