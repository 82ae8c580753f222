"""Event-analytics operators: funnel + retention cohorts.

The warehouse-side event analyses a CDC pipeline's consumers run over
the replicated events table (the reference's warehouse views,
`docker/postgres/init.sql:195-206`, generalized): ordered funnel
conversion and cohort retention. Both are exact-integer outputs with
full SQL oracles.

Scale shape: per-user scalars (funnel stage timestamps, cohort day)
are keyed aggregations — each step is one shuffle on user_id and the
step joins stay on that same key, so a clustered-by-user layout runs
the whole funnel without a single repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table


@query(
    "q_funnel_conversion",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
    ), s1 AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts_ms END) AS t1
        FROM ev GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, s1.t1, MIN(e.ts_ms) AS t2
        FROM ev e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view' AND e.ts_ms > s1.t1
        GROUP BY e.user_id, s1.t1
    ), s3 AS (
        SELECT e.user_id, MIN(e.ts_ms) AS t3
        FROM ev e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts_ms > s2.t2
        GROUP BY e.user_id
    )
    SELECT CAST(COUNT(s1.t1) AS BIGINT) AS n_signup,
           CAST(COUNT(s2.t2) AS BIGINT) AS n_signup_view,
           CAST(COUNT(s3.t3) AS BIGINT) AS n_signup_view_purchase
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    WHERE s1.t1 IS NOT NULL
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup -> view -> purchase: each stage counts
    users whose stage event happened strictly AFTER their previous
    stage's first event (not merely users who did all three in any
    order — the distinction that makes funnels order-sensitive).
    Three keyed aggregations, all on user_id."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ts_ms")
    )
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_ms"))).alias("t1")
    ).filter(F.col("t1").isNotNull())
    s2 = (
        ev.join(s1, "user_id")
        .filter((F.col("event_type") == "view") & (F.col("ts_ms") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t2"))
    )
    s3 = (
        ev.join(s2, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts_ms") > F.col("t2"))
        )
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count("t1").alias("n_signup"),
            F.count("t2").alias("n_signup_view"),
            F.count("t3").alias("n_signup_view_purchase"),
        )
    )


@query(
    "q_retention_cohort",
    oracle="""
    WITH ev AS (
        SELECT user_id, date_trunc('day', ts) AS day FROM events
    ), cohort AS (
        SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
    )
    SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', c.cohort_day, e.day) AS BIGINT)
               AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM ev e JOIN cohort c ON e.user_id = c.user_id
    WHERE date_diff('day', c.cohort_day, e.day) <= 7
    GROUP BY 1, 2
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day,
    counted as active on each of the following 7 day-offsets. Two
    keyed aggregations + one join on user_id; the matrix itself is
    tiny (days x 8)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(cohort, "user_id")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias(
                "day_offset"
            ),
            "user_id",
        )
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
