"""Bucketed co-located join: the join plan over two tables bucketed on
the join key must contain NO shuffle (Exchange) — the storage-level
analog of the reference's Kafka key-hash partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.sources.bucketed import read_bucketed, write_bucketed
from scylla_pg_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], n_buckets=8)
    # at test scale the planner would broadcast (which bypasses bucket
    # reuse entirely); force the fact-fact SMJ path the feature targets
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield "b_orders", "b_lineitem"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    bo, bl = bucketed_tables
    joined = read_bucketed(spark, bo).join(
        read_bucketed(spark, bl),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "bucketed join must not shuffle"


def test_bucketed_join_results_match_plain(spark, bucketed_tables):
    bo, bl = bucketed_tables
    bucketed_n = (
        read_bucketed(spark, bo)
        .join(
            read_bucketed(spark, bl),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    plain_n = (
        load_table(spark, SF_SMALL, "orders")
        .join(
            load_table(spark, SF_SMALL, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert bucketed_n == plain_n > 0


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_tables):
    _, bl = bucketed_tables
    agg = read_bucketed(spark, bl).groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "groupBy on bucket key must not shuffle"


def test_date_partitioned_scan_prunes(spark, tmp_path):
    """A date filter over a date-partitioned fact table must prune at
    the partition level (PartitionFilters), not scan-and-filter."""
    from scylla_pg_cdc_spark.sources.bucketed import write_date_partitioned

    events = load_table(spark, SF_SMALL, "events")
    path = str(tmp_path / "events_by_day")
    write_date_partitioned(events, path, "ts")

    pruned = spark.read.parquet(path).filter(
        F.col("event_date") == "2024-01-03"
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan
    # only one day's directory is read
    files = pruned.select(F.input_file_name()).distinct().collect()
    assert all("event_date=2024-01-03" in r[0] for r in files)
    # and the row count matches the unpartitioned filter
    want = events.filter(F.to_date("ts") == "2024-01-03").count()
    assert pruned.count() == want > 0
