"""Window-function operators.

The reference has no SQL window functions, but several behaviors are
window-shaped (SURVEY.md §2A W1-W5): upsert "last write wins by commit
timestamp" compaction (`postgres-sink.json:22-24`, ordering guarantee
`data-model.md:372-381`), write-gap analysis (`docs/CDC_LAG.md:47-54`),
running stock levels (`docker/scylla/init.cql:93-96`), top-N
discrepancy ranking (`data-model.md:587-595`).

Determinism note: the reference relies on Kafka per-key ordering for
deterministic upserts; here every window ORDER BY carries a unique
tiebreak (event_id / linenumber), and event-time ordering uses
epoch-millis on both engines so DuckDB's ns precision vs Spark's us
parquet truncation can never reorder ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.functions.money import cents
from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table


@query(
    "q_window_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, ts_ms, value
    FROM (
        SELECT user_id, event_id, event_type,
               epoch_ms(ts) AS ts_ms, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_ms(ts) DESC, event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest state per key — the upsert compaction core (W1/S7):
    row_number over (partition by key order by ts desc) = 1. One shuffle
    by key; at 100 TB this is the canonical one-pass compaction."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_millis("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("ts_ms", F.unix_millis("ts"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts_ms", "value")
    )


@query(
    "q_window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_name,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
           CAST(DENSE_RANK() OVER (
               PARTITION BY c_nationkey
               ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT) DESC, c_custkey
           ) AS BIGINT) AS bal_rank
    FROM customer
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking within partition (W4; top-discrepancy ordering,
    `data-model.md:587-595`)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("acctbal_cents").desc(), F.col("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_name",
        cents("c_acctbal").alias("acctbal_cents"),
    ).withColumn("bal_rank", F.dense_rank().over(w).cast("long"))


@query(
    "q_window_lag_gap",
    oracle="""
    SELECT user_id, event_id, gap_ms
    FROM (
        SELECT user_id, event_id,
               epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
               ) AS gap_ms
        FROM events
    ) WHERE gap_ms IS NOT NULL
    """,
)
def q_window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap per key via lag (W2; successive-write gap
    analysis, `docs/CDC_LAG.md:47-54`)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    return (
        events.withColumn("ts_ms", F.unix_millis("ts"))
        .withColumn("gap_ms", F.col("ts_ms") - F.lag("ts_ms").over(w))
        .filter(F.col("gap_ms").isNotNull())
        .select("user_id", "event_id", "gap_ms")
    )


@query(
    "q_window_running_sum",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey,
           CAST(SUM(l_quantity) OVER (
               PARTITION BY l_orderkey
               -- r10 compound fuzz: NULLS FIRST on nullable
               -- tiebreaks, and the MEASURE as the final tiebreak —
               -- a NULL l_partkey collapses two distinct rows into a
               -- full-key tie, and a running sum over an
               -- order-undefined tie diverges; value-identical ties
               -- give identical outputs in any order
               ORDER BY l_linenumber, l_partkey NULLS FIRST,
                        l_suppkey NULLS FIRST, l_quantity NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS running_qty
    FROM lineitem
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per key (W3; running stock level chains,
    `init.cql:93-96,182-189`). (l_orderkey, l_linenumber) is NOT unique
    in the synthetic data, so the ORDER BY carries the full unique key
    (linenumber, partkey, suppkey) for a deterministic frame."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        # measure-as-final-tiebreak: see the oracle comment (r10)
        .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.sum("l_quantity").over(w).cast("long").alias("running_qty"),
    )


@query(
    "q_window_moving_avg",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey,
           AVG(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) OVER (
               PARTITION BY l_orderkey
               -- r10 compound fuzz: see q_window_running_sum —
               -- measure-as-final-tiebreak makes the frame
               -- order-insensitive under full-key ties
               ORDER BY l_linenumber, l_partkey NULLS FIRST,
                        l_suppkey NULLS FIRST,
                        CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                            NULLS FIRST
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) / 100.0 AS mov_avg_price
    FROM lineitem
    """,
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a bounded row frame (W5 frame spec); full
    unique-key ORDER BY for frame determinism."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy(
            "l_linenumber", "l_partkey", "l_suppkey",
            cents("l_extendedprice"),
        )
        .rowsBetween(-2, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        (F.avg(cents("l_extendedprice")).over(w) / F.lit(100.0)).alias(
            "mov_avg_price"
        ),
    )


@query(
    "q_window_first_last",
    oracle="""
    SELECT user_id, event_id, ts_ms,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id) OVER (
               PARTITION BY user_id ORDER BY ts_ms NULLS FIRST, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_event,
           NTH_VALUE(event_id, 2) OVER (
               PARTITION BY user_id ORDER BY ts_ms NULLS FIRST, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_event
    FROM (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events)
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts_ms NULLS FIRST, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over the full-partition
    frame (the remaining analytic-window family; unique-key ordered)."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "user_id", "event_id", F.unix_millis("ts").alias("ts_ms")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return base.select(
        "user_id",
        "event_id",
        "ts_ms",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w).alias("last_event"),
        F.nth_value("event_id", 2).over(w).alias("second_event"),
    )


@query(
    "q_window_percentile_rank",
    oracle="""
    SELECT c_custkey, c_nationkey,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (
        PARTITION BY c_nationkey
        ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT) NULLS FIRST, c_custkey
    )
    """,
)
def q_window_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile — relative-position analytics
    (W5-adjacent); the ratios are exact small-integer divisions, so
    cross-engine bit-identical under the unique total order.

    NULL ordering is pinned explicitly: Spark ASC defaults to NULLS
    FIRST, DuckDB (like Postgres) to NULLS LAST — on a corpus with
    NULL balances the two engines silently rank the same row 0.0 vs
    1.0 (round-9 nulls-profile fuzzing).  Every ORDER BY over a
    nullable expression must declare its NULL end on both sides."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        cents("c_acctbal").asc_nulls_first(), F.col("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "q_window_range_interval",
    oracle="""
    SELECT user_id, event_id, ts_ms,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_24h,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS value_cents_24h
    FROM (
        SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events
    )
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts_ms
        RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW
    )
    """,
)
def q_window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 24-hour per-user activity via a RANGE (value-based)
    frame — the time-interval window shape ROWS frames can't express:
    the frame holds every event whose timestamp is within 24h of the
    current one, however many rows that is. RANGE frames include all
    peer rows of equal ts, so the result is deterministic even with
    tied timestamps. One shuffle + per-partition sort, same cost
    envelope as any window at 100 TB."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        cents("value").alias("vc"),
    )
    day_ms = 86_400_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(-(day_ms - 1), Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts_ms",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.sum("vc").over(w).cast("long").alias("value_cents_24h"),
    )
