"""Subquery-shaped analytics: HAVING, EXISTS/IN subqueries, scalar
subqueries, CUBE.

The reference's warehouse layer expresses these shapes through views
and joins (`docker/postgres/init.sql:323-539`); here they are declared
directly and Catalyst decorrelates them: EXISTS/IN become left-semi
joins, scalar subqueries become broadcast cross-joins of a 1-row
aggregate — verify with tools/audit_plans.py (no nested-loop
re-execution per row, ever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.functions.money import cents
from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table


@query(
    "q_having_groups",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(l_quantity) > 250
    """,
)
def q_having_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 core: groups filtered on their aggregate (HAVING).
    In DataFrame terms a post-aggregation filter — still one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("raw_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        # filter on the RAW sum exactly like the oracle's HAVING; the
        # long cast is presentation only (cast truncates, so filtering
        # post-cast would diverge on fractional quantities)
        .filter(F.col("raw_qty") > 250)
        .select(
            "l_orderkey",
            # round-then-cast: DuckDB's double->BIGINT cast rounds while
            # Spark's truncates; rounding first matches on any data
            F.round("raw_qty").cast("long").alias("total_qty"),
            "n_lines",
        )
    )


@query(
    "q_exists_subquery",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS — Catalyst decorrelates to a
    left-semi join (no per-row re-execution)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "q_in_subquery",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders
        WHERE o_totalprice > 400000 AND o_orderstatus = 'F'
    )
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery membership — decorrelated to left-semi on the
    filtered subquery (filter pushed below the join)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_totalprice") > 400000) & (F.col("o_orderstatus") == "F")
    )
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT p_partkey, p_name,
           CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
    FROM part
    WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (above-average filter). AVG over doubles is
    order-dependent in general, but it is only *compared against*, and
    part prices are 2-decimal values far from the threshold — both
    engines agree. Catalyst plans the 1-row aggregate as a broadcast."""
    p = load_table(spark, sf_dir, "part")
    # spark.sql-style scalar subquery via a cross-joined 1-row agg:
    avg_price = p.agg(F.avg("p_retailprice").alias("__avg"))
    return (
        p.join(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > F.col("__avg"))
        .select(
            "p_partkey",
            "p_name",
            cents("p_retailprice").alias("price_cents"),
        )
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_amount
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping combinations in one
    pass (completes the rollup/grouping-sets/cube family)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("total_amount"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "total_amount",
        )
    )


@query(
    "q_correlated_min",
    oracle="""
    SELECT p.p_partkey, p.p_type,
           CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS price_cents
    FROM part p
    WHERE CAST(ROUND(p.p_retailprice * 100) AS BIGINT) = (
        SELECT MIN(CAST(ROUND(p2.p_retailprice * 100) AS BIGINT))
        FROM part p2 WHERE p2.p_type = p.p_type
    )
    """,
)
def q_correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 core: rows matching their group's MIN via a correlated
    scalar subquery — decorrelated to a per-group aggregate join
    (cents compare keeps it exact)."""
    p = load_table(spark, sf_dir, "part")
    priced = p.select(
        "p_partkey", "p_type", cents("p_retailprice").alias("price_cents")
    )
    mins = priced.groupBy("p_type").agg(
        F.min("price_cents").alias("min_cents")
    )
    return (
        priced.join(F.broadcast(mins), on="p_type")
        .filter(F.col("price_cents") == F.col("min_cents"))
        .select("p_partkey", "p_type", "price_cents")
    )
