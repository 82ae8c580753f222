"""DLQ replay + resumable reconciliation tests (S10/S11 parity:
check-dlq.sh / replay-dlq.sh / checkpointed reconcile resume)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.operators.resumable import reconcile_resumable
from scylla_pg_cdc_spark.streaming.dlq import dlq_summary, replay_dlq
from scylla_pg_cdc_spark.streaming.pipeline import (
    latest_state,
    run_upsert_pipeline,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def work_dir():
    d = tempfile.mkdtemp(prefix="ops_util_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def pipeline_out(spark, work_dir):
    return run_upsert_pipeline(spark, SF_SMALL, work_dir)


def test_dlq_summary_counts(spark, pipeline_out):
    s = dlq_summary(spark, pipeline_out["dlq"]).collect()
    assert len(s) >= 1
    assert all(r["n"] > 0 and r["oldest_ms"] <= r["newest_ms"] for r in s)


def test_dlq_replay_dry_run_then_execute(spark, pipeline_out):
    dry = replay_dlq(
        spark, pipeline_out["dlq"], pipeline_out["state"], max_messages=5
    )
    assert dry["would_replay"] == 5 and dry["replayed"] == 0
    before = latest_state(spark, pipeline_out["state"]).count()
    res = replay_dlq(
        spark,
        pipeline_out["dlq"],
        pipeline_out["state"],
        max_messages=5,
        dry_run=False,
    )
    assert res["replayed"] == 5
    after = latest_state(spark, pipeline_out["state"]).count()
    assert after >= before  # replays upsert (some keys may be new)


def test_resumable_reconcile_survives_crash(spark, tmp_path):
    source = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    target = spark.range(0, 500).filter(F.col("id") % 7 != 0).select(
        F.col("id").alias("k"),
        (F.col("id") * 2 + F.when(F.col("id") % 11 == 0, 1).otherwise(0)).alias("v"),
    )
    wd = str(tmp_path / "recon")
    with pytest.raises(RuntimeError, match="injected failure"):
        reconcile_resumable(
            spark, source, target, ["k"], wd, n_buckets=8, fail_after_bucket=3
        )
    done_after_crash = {
        r["bucket"] for r in spark.read.parquet(wd + "/progress").collect()
    }
    assert len(done_after_crash) == 3
    # resume completes only the remaining buckets and yields the full diff
    diff = reconcile_resumable(spark, source, target, ["k"], wd, n_buckets=8)
    by_type = {
        r["diff_type"]: r["n"]
        for r in diff.groupBy("diff_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    missing = {r["k"] for r in diff.filter(F.col("diff_type") == "missing").collect()}
    assert missing == {i for i in range(500) if i % 7 == 0}
    assert by_type["mismatch"] == len(
        {i for i in range(500) if i % 11 == 0 and i % 7 != 0 and i != 0}
    )
    assert by_type["missing"] + by_type["mismatch"] + by_type["match"] == 500


def test_sql_face_over_registered_views(spark):
    """The raw-SQL face (reference's warehouse entry point,
    `docker/postgres/init.sql` views): register_views + spark.sql must
    agree with the DataFrame API on the same aggregation, and the SQL
    plan must keep scan-level pushdown (same Catalyst plan either way)."""
    from pyspark.sql import functions as F

    from scylla_pg_cdc_spark.sources.tables import load_table, register_views
    from tests.conftest import SF_SMALL
    from tools.audit_plans import plan_facts

    register_views(spark, SF_SMALL)
    sql_df = spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice * 100 AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders WHERE o_totalprice > 1000
        GROUP BY o_orderstatus
        """
    )
    orders = load_table(spark, SF_SMALL, "orders")
    api_df = (
        orders.filter(F.col("o_totalprice") > 1000)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    got = {tuple(r) for r in sql_df.collect()}
    want = {tuple(r) for r in api_df.collect()}
    assert got == want and got
    facts = plan_facts(sql_df)
    assert facts["pushed"] and facts["shuffles"] <= 1, facts
