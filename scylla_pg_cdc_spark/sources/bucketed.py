"""Bucketed (co-located) tables: the zero-shuffle repeated-join path.

At 100 TB, a fact⋈fact join shuffles both sides every run. If the same
join key is used repeatedly (orders⋈lineitem on orderkey; the CDC
state table joined by primary key every micro-batch), bucketing both
tables by that key at write time pre-partitions the data so Spark's
planner drops the Exchange entirely — the join reads co-located
buckets. This is the Spark-native analog of the reference's Kafka
key-hash partitioning (`data-model.md:372-381`), applied to storage.

Bucketing requires the session catalog (`saveAsTable`); bucket counts
should be sized so each bucket ~ 100-500 MB at the target scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table. Sorting within buckets additionally removes the per-task
    Sort from sort-merge joins."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    partition_col: str = "event_date",
) -> None:
    """Persist a fact table partitioned by event date. At 100 TB this
    is the first-order scan reducer: time-bounded queries read only
    the matching date directories (PartitionFilters in the plan), and
    retention becomes a directory drop instead of a delete job."""
    from pyspark.sql import functions as F

    df.withColumn(partition_col, F.to_date(ts_col)).write.mode(
        "overwrite"
    ).partitionBy(partition_col).parquet(path)
