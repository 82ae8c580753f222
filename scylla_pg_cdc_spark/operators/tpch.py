"""TPC-H query suite over the synthetic star schema.

The reference's warehouse side serves ad-hoc SQL over the replicated
tables (`docker/postgres/init.sql`, `specs/001-scylla-pg-cdc/
data-model.md:430-460`); this module proves the engine covers the
canonical analytics shapes those users run — the TPC-H queries — as
DataFrame plans with exact DuckDB oracles.

Adaptations (the driver's TPC-H-ish schema omits some columns; each
query keeps its *shape* — the join/agg/subquery structure Catalyst has
to plan — and swaps the missing column for an available analog):

- no ``partsupp``/``p_mfgr``/``p_container`` -> Q2/Q9/Q11/Q16/Q20 run
  against lineitem-derived part-supplier facts instead: supplycost :=
  min line price (Q2) / p_retailprice (Q9/Q11), availqty := shipped
  quantity (Q11/Q20), the partsupp relation := DISTINCT (l_partkey,
  l_suppkey) (Q16).  Every join/agg/subquery shape of the canonical
  query is preserved — only the missing column is proxied.
- no ``l_commitdate``/``l_receiptdate`` -> "late" is
  ``l_shipdate > o_orderdate + INTERVAL N DAYS`` (Q4/Q12/Q21).
- no ``l_shipmode`` -> Q12 buckets by lateness instead.
- no ``o_comment``/``c_phone`` -> Q13 excludes 5-LOW priority
  orders; Q22 groups by nation key instead of phone prefix.

Parity discipline (see tests/check_oracle): money in integer
cent/cent-pct units with ONE presentation division; ratio columns are
single IEEE divisions of exact integers; every LIMIT carries a total
tiebreak; no float grouping keys.

Q1 already exists as ``q_agg_pricing_summary``
(operators/aggregates.py) and is not duplicated here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.functions.money import cents, pct_units
from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


_CPCT_SQL = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)


def _cpct():
    """Revenue line value in exact cent-pct integer units."""
    return cents("l_extendedprice") * (100 - pct_units("l_discount"))


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_CPCT_SQL}) AS BIGINT) AS revenue_cpct,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-15'
      AND l_shipdate > TIMESTAMP '1998-06-15'
    GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
    ORDER BY revenue_cpct DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: top-10 unshipped orders by revenue for one
    market segment. Plan: customer dim broadcasts into orders, SMJ/BHJ
    to lineitem, one aggregation, TakeOrdered(10)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-06-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1998-06-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .agg(F.sum(_cpct()).cast("long").alias("revenue_cpct"))
        .select("l_orderkey", "revenue_cpct", "order_date")
        .orderBy(F.col("revenue_cpct").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking (late-line EXISTS; shipdate-lag
    stands in for the absent commit/receipt dates). Plan: semi join —
    no row duplication, one aggregation."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name, CAST(SUM({_CPCT_SQL}) AS BIGINT) AS revenue_cpct
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: 6-table join with the
    customer-nation == supplier-nation colocation twist. Plan: dims
    broadcast; the only shuffles are lineitem⋈orders and the final
    aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_cpct()).cast("long").alias("revenue_cpct"))
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cpct,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting-revenue change: pure scan+filter+agg — the
    pushdown showcase (all three predicates reach the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = pct_units("l_discount")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & disc.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(cents("l_extendedprice") * disc)
            .cast("long")
            .alias("revenue_cpct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           strftime(l_shipdate, '%Y') AS l_year,
           CAST(SUM({_CPCT_SQL}) AS BIGINT) AS revenue_cpct
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, strftime(l_shipdate, '%Y')
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations, by year; the dual-alias
    dimension join (nation joined twice under different roles)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("l_year"),
        )
        .agg(F.sum(_cpct()).cast("long").alias("revenue_cpct"))
    )


@query(
    "q_tpch_q8",
    oracle=f"""
    WITH all_nations AS (
        SELECT strftime(o_orderdate, '%Y') AS o_year,
               {_CPCT_SQL} AS volume_cpct,
               n1.n_name AS supp_nation
        FROM part, supplier, lineitem, orders, customer,
             nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r_regionkey AND r_name = 'AMERICA'
          AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                         THEN volume_cpct ELSE 0 END) AS BIGINT)
               AS nation_cpct,
           CAST(SUM(volume_cpct) AS BIGINT) AS total_cpct,
           SUM(CASE WHEN supp_nation = 'NATION_3'
                    THEN volume_cpct ELSE 0 END)
               / CAST(SUM(volume_cpct) AS DOUBLE) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: one nation's slice of regional volume
    per year. The share is a single IEEE division of two exact integer
    sums, so the oracle is exact despite the ratio."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    vol = F.col("volume_cpct")
    nat = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == region.r_regionkey)
        .select(
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
            _cpct().alias("volume_cpct"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.sum(nat).cast("long").alias("nation_cpct"),
            F.sum(vol).cast("long").alias("total_cpct"),
            (F.sum(nat) / F.sum(vol).cast("double")).alias("mkt_share"),
        )
    )


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_CPCT_SQL}) AS BIGINT) AS revenue_cpct, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND c_nationkey = n_nationkey AND l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_cpct DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: top-20 customers by lost revenue in
    one quarter."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-07-01"))
        & (F.col("o_orderdate") < _ts("1997-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_cpct()).cast("long").alias("revenue_cpct"))
        .select("c_custkey", "c_name", "revenue_cpct", "n_name")
        .orderBy(F.col("revenue_cpct").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                THEN 'late' ELSE 'ontime' END AS ship_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-mode/priority matrix, adapted: the schema has no
    l_shipmode, so lines bucket by lateness and the conditional counts
    keep Q12's priority-class split."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.when(
                li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS"),
                "late",
            )
            .otherwise("ontime")
            .alias("ship_bucket"),
            high.alias("is_high"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~F.col("is_high"), 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution (the double aggregation);
    the comment-pattern exclusion becomes a priority exclusion."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_CPCT_SQL}
                         ELSE 0 END) AS BIGINT) AS promo_cpct,
           CAST(SUM({_CPCT_SQL}) AS BIGINT) AS total_cpct,
           SUM(CASE WHEN p_type = 'PROMO' THEN {_CPCT_SQL} ELSE 0 END)
               * CAST(100 AS DOUBLE)
               / SUM({_CPCT_SQL}) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: promo share of one month's revenue; ratio
    = one IEEE division of exact integers."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    part = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _cpct()).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(promo).cast("long").alias("promo_cpct"),
            F.sum(_cpct()).cast("long").alias("total_cpct"),
            (F.sum(promo) * F.lit(100.0) / F.sum(_cpct())).alias(
                "promo_revenue_pct"
            ),
        )
    )


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_CPCT_SQL}) AS BIGINT) AS total_cpct
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_cpct
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_cpct = (SELECT MAX(total_cpct) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: per-supplier quarter revenue vs the scalar max
    (exact integer units make the max/equality engine-stable)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_cpct()).cast("long").alias("total_cpct")
    )
    max_rev = revenue.agg(F.max("total_cpct").alias("m"))
    return (
        F.broadcast(supp)
        .join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_cpct") == F.col("m"))
        .select("s_suppkey", "s_name", "total_cpct")
    )


@query(
    "q_tpch_q17",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey, AVG(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON part_avg.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#15'
      AND l_quantity < CAST(0.5 AS DOUBLE) * avg_qty
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity revenue: lines below half their part's mean
    quantity (correlated avg rewritten as a grouped self-join —
    the scale-correct plan). Quantities are integral doubles, so the
    avg and comparison are engine-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#15"
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(part_avg, li.l_partkey == F.col("pa_key"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            F.sum(cents("l_extendedprice")).cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q18",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, order_date, totalprice_cents
    ORDER BY totalprice_cents DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: orders whose total quantity clears a
    threshold (IN-subquery -> semi join), re-aggregated with customer
    context."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"),
                li.l_orderkey == F.col("bk"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            cents("o_totalprice").alias("totalprice_cents"),
        )
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
        .orderBy(F.col("totalprice_cents").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT CAST(SUM({_CPCT_SQL}) AS BIGINT) AS revenue_cpct,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue under disjunctive brand/size/quantity
    predicates (the OR-of-ANDs pushdown shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_cpct()).cast("long").alias("revenue_cpct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers-who-kept-orders-waiting: the EXISTS + NOT-EXISTS
    double correlation, as per-order distinct-supplier counts. 'Late'
    adapts to the shipdate-lag rule (no receipt/commit dates in this
    schema).

    r12 (guide §2.3/§3): the semi + anti join form shuffled the full
    lineitem table twice more (once per correlated subquery, each a
    non-equi join re-exchanging both sides). The correlations only
    need two per-order facts — EXISTS(other supplier) == the order
    has >= 2 distinct suppliers, and NOT EXISTS(other LATE supplier)
    == the order's late lines name exactly 1 distinct supplier (my
    own late line is in that set and my suppkey is non-NULL via the
    supplier join; a NULL l2/l3 suppkey can never satisfy `<>`, and
    countDistinct ignores NULLs the same way). So: one aggregation of
    the late frame keyed like its own join (the exchange is reused),
    one supplier-count aggregation over bare lineitem, and line-level
    multiplicity preserved by joining the flags back onto each late
    line. Oracle (the literal EXISTS form) re-verified at two SFs."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    late_supp = l1.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_late_supp")
    )
    all_supp = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp")
    )
    sole_late = (
        l1.join(late_supp, "l_orderkey")
        .join(all_supp, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        sole_late.join(F.broadcast(supp), sole_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q_tpch_q22",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS totacctbal_cents
    FROM customer
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > (
        SELECT AVG(CAST(ROUND(c_acctbal * 100) AS BIGINT))
        FROM customer WHERE c_acctbal > 0
    )
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity: rich customers with no RECENT
    orders, per nation (phone-prefix grouping adapts to nation key;
    'never ordered' adapts to 'not since 1999' — every customer has
    some order in this dataset). The scalar avg compares in exact
    integer cents, so the boundary is engine-stable."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01")
    )
    bal = cents("c_acctbal")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg(bal).alias("ab"))
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(bal > F.col("ab"))
        .join(
            orders.select(F.col("o_custkey").alias("ok")),
            cust.c_custkey == F.col("ok"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("long").alias("totacctbal_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Q2/Q9/Q11/Q16/Q20 — partsupp-family, adapted to lineitem-derived facts
# ---------------------------------------------------------------------------


@query(
    "q_tpch_q2",
    oracle="""
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cost_cents
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eur AS (
        SELECT c.l_partkey, c.cost_cents, s.s_name, s.s_acctbal, n.n_name
        FROM costs c
        JOIN supplier s ON c.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT CAST(ROUND(e.s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
           e.s_name, e.n_name, p.p_partkey, e.cost_cents
    FROM eur e JOIN part p ON e.l_partkey = p.p_partkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
      AND e.cost_cents = (SELECT MIN(e2.cost_cents) FROM eur e2
                          WHERE e2.l_partkey = e.l_partkey)
    ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier (adapted: supplycost := the supplier's
    cheapest line price for the part, exact integer cents). Keeps the
    canonical correlated-MIN-subquery shape as a window min over the
    region-filtered costs; dims broadcast."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cents("l_extendedprice")).alias("cost_cents")
    )
    eur = (
        costs.join(
            F.broadcast(supp), costs.l_suppkey == supp.s_suppkey
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("l_partkey", "cost_cents", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    best = eur.withColumn("min_cost", F.min("cost_cents").over(w)).filter(
        F.col("cost_cents") == F.col("min_cost")
    )
    return (
        best.join(
            F.broadcast(
                part.filter(
                    F.col("p_size").between(10, 20)
                    & (F.col("p_type") == "STANDARD")
                )
            ),
            best.l_partkey == part.p_partkey,
        )
        .select(
            cents("s_acctbal").alias("s_acctbal_cents"),
            "s_name",
            "n_name",
            "p_partkey",
            "cost_cents",
        )
        .orderBy(
            F.col("s_acctbal_cents").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q_tpch_q9",
    oracle=f"""
    SELECT n_name,
           strftime(o_orderdate, '%Y') AS o_year,
           CAST(SUM({_CPCT_SQL}
                    - CAST(ROUND(p_retailprice * 100) AS BIGINT)
                      * CAST(ROUND(l_quantity) AS BIGINT) * 100)
                AS BIGINT) AS profit_cpct
    FROM lineitem, part, supplier, orders, nation
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit by nation and year (adapted: supplycost
    := p_retailprice, so profit = revenue − retail cost of the shipped
    quantity, in exact cent-pct integer units)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    qty = F.round(F.col("l_quantity")).cast("long")
    profit = _cpct() - cents("p_retailprice") * qty * 100
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name", F.date_format("o_orderdate", "yyyy").alias("o_year")
        )
        .agg(F.sum(profit).alias("profit_cpct"))
    )


@query(
    "q_tpch_q11",
    oracle="""
    WITH avail AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS availqty
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    asia AS (
        SELECT a.l_partkey, a.availqty
        FROM avail a
        JOIN supplier s ON a.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    ),
    val AS (
        SELECT a.l_partkey AS p_partkey,
               CAST(SUM(a.availqty
                        * CAST(ROUND(p.p_retailprice * 100) AS BIGINT))
                    AS BIGINT) AS value_cents
        FROM asia a JOIN part p ON a.l_partkey = p.p_partkey
        GROUP BY a.l_partkey
    )
    SELECT p_partkey, value_cents FROM val
    WHERE value_cents * (SELECT COUNT(*) FROM val)
          > 2 * (SELECT SUM(value_cents) FROM val)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock (adapted: availqty := shipped quantity,
    supplycost := p_retailprice). Canonical scalar-subquery threshold
    kept scale-free and integer-exact: a part qualifies when its value
    exceeds 2x the mean part value (cross-multiplied, no division)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    avail = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("availqty")
    )
    asia = (
        avail.join(F.broadcast(supp), avail.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("l_partkey", "availqty")
    )
    val = (
        asia.join(F.broadcast(part), asia.l_partkey == part.p_partkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(F.col("availqty") * cents("p_retailprice")).alias(
                "value_cents"
            )
        )
    )
    tot = val.agg(
        F.count(F.lit(1)).alias("n"), F.sum("value_cents").alias("t")
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * F.col("n") > 2 * F.col("t"))
        .select("p_partkey", "value_cents")
    )


@query(
    "q_tpch_q16",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT pr.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs pr JOIN part p ON pr.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND pr.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier-count per part attribute (adapted: the partsupp
    relation := DISTINCT (l_partkey, l_suppkey) observed in lineitem;
    'complaint' suppliers := s_acctbal < 1000, excluded by anti join
    — the canonical NOT IN shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")

    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = supp.filter(F.col("s_acctbal") < 1000).select("s_suppkey")
    pf = part.filter(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        pairs.join(
            F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(F.broadcast(pf), pairs.l_partkey == pf.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q20",
    oracle="""
    WITH avail AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    tot AS (SELECT l_partkey, SUM(qty) AS total_qty FROM avail GROUP BY l_partkey),
    excess AS (
        SELECT a.l_suppkey
        FROM avail a
        JOIN tot t ON a.l_partkey = t.l_partkey
        JOIN part p ON a.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'small%' AND a.qty * 10 > t.total_qty * 3
    )
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM excess)
      AND n.n_regionkey IN (
          SELECT r_regionkey FROM region WHERE r_name = 'AFRICA')
    ORDER BY s_name
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 suppliers with excess availability (adapted: availqty :=
    quantity shipped in 1996; 'excess' := the supplier moved >30% of
    the part's 1996 volume, cross-multiplied integer compare). Keeps
    the canonical nested-IN chain as semi joins."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    avail = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"))
    )
    tot = avail.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    excess = (
        avail.join(tot, on="l_partkey")
        .join(
            F.broadcast(part.filter(F.col("p_name").like("small%"))),
            avail.l_partkey == part.p_partkey,
        )
        .filter(F.col("qty") * 10 > F.col("total_qty") * 3)
        .select("l_suppkey")
    )
    afr = region.filter(F.col("r_name") == "AFRICA").select("r_regionkey")
    return (
        supp.join(
            excess, supp.s_suppkey == excess.l_suppkey, "left_semi"
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(afr),
            nation.n_regionkey == afr.r_regionkey,
            "left_semi",
        )
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
