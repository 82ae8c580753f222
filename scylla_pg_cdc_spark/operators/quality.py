"""Warehouse data-quality audit — the checked query face of the
declarative constraint engine (``functions/constraints.py``).

Reference anchor: ``tests/validation/warehouse_checks.sql`` runs
hand-written probes (row counts, orphans, nulls); this runs the same
checks as a RULE SET compiled to fused aggregate scans + anti joins,
one summary row per rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scylla_pg_cdc_spark.functions import constraints as C
from scylla_pg_cdc_spark.registry import query
from scylla_pg_cdc_spark.sources.tables import load_table

_RULES = [
    C.not_null("lineitem_orderkey_not_null", "lineitem", "l_orderkey"),
    C.accepted_range(
        "lineitem_discount_range", "lineitem", "l_discount", 0.0, 0.1
    ),
    C.accepted_values(
        "orders_status_domain", "orders", "o_orderstatus", "O", "F", "P"
    ),
    C.expression(
        "lineitem_price_consistency",
        "lineitem",
        "l_extendedprice <= 0 OR l_quantity <= 0",
    ),
    C.unique("customer_pk_unique", "customer", "c_custkey"),
    C.unique(
        "lineitem_pk_unique", "lineitem", "l_orderkey", "l_linenumber"
    ),
    C.foreign_key(
        "lineitem_orders_fk", "lineitem", ("l_orderkey",),
        "orders", ("o_orderkey",),
    ),
    C.foreign_key(
        "orders_customer_fk", "orders", ("o_custkey",),
        "customer", ("c_custkey",),
    ),
]


@query(
    "q_constraint_audit",
    oracle="""
    SELECT 'lineitem_orderkey_not_null' AS rule, 'not_null' AS kind,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_range', 'accepted_range',
           CAST(SUM(CASE WHEN l_discount IS NULL
                          OR l_discount < 0.0
                          OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders_status_domain', 'accepted_values',
           CAST(SUM(CASE WHEN o_orderstatus IS NULL
                          OR o_orderstatus NOT IN ('O', 'F', 'P')
                     THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_price_consistency', 'expression',
           CAST(SUM(CASE WHEN l_extendedprice <= 0 OR l_quantity <= 0
                     THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'customer_pk_unique', 'unique',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS n FROM customer GROUP BY c_custkey
          HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'lineitem_pk_unique', 'unique',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS n FROM lineitem
          GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'lineitem_orders_fk', 'foreign_key',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders_customer_fk', 'foreign_key',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
)
def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full warehouse quality gate in one shot: 8 declarative rules
    (nulls, ranges, value domains, row-local invariants, two primary
    keys, two foreign keys) compiled by ``constraints.audit`` — the
    four row-local lineitem rules fuse into ONE scan, uniqueness is a
    keyed aggregation, FKs are broadcast anti joins. The clean
    testdata yields all-zero violation counts, which is itself the
    checked assertion (the reference's warehouse_checks contract)."""
    tables = {
        t: load_table(spark, sf_dir, t)
        for t in ("lineitem", "orders", "customer")
    }
    return C.audit(tables, _RULES)


@query(
    "q_drift_ks",
    oracle="""
    WITH ev AS (
        SELECT event_type,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS vc,
               epoch_ms(ts) AS ts_ms
        FROM events WHERE value IS NOT NULL
    ), mid AS (
        SELECT (MIN(ts_ms) + MAX(ts_ms)) // 2 AS m FROM ev
    ), pt AS (
        SELECT event_type, vc,
               CAST(SUM(CASE WHEN ts_ms <= (SELECT m FROM mid)
                        THEN 1 ELSE 0 END) AS BIGINT) AS d1,
               CAST(SUM(CASE WHEN ts_ms <= (SELECT m FROM mid)
                        THEN 0 ELSE 1 END) AS BIGINT) AS d2
        FROM ev GROUP BY event_type, vc
    ), cum AS (
        SELECT event_type, vc,
               SUM(d1) OVER (PARTITION BY event_type ORDER BY vc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
               SUM(d2) OVER (PARTITION BY event_type ORDER BY vc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
               SUM(d1) OVER (PARTITION BY event_type) AS n1,
               SUM(d2) OVER (PARTITION BY event_type) AS n2
        FROM pt
    ), dist AS (
        SELECT event_type, n1, n2,
               ABS(CAST(c1 AS HUGEINT) * CAST(n2 AS HUGEINT)
                   - CAST(c2 AS HUGEINT) * CAST(n1 AS HUGEINT)) AS num
        FROM cum
    )
    SELECT event_type,
           CAST(MAX(n1) AS BIGINT) AS n_early,
           CAST(MAX(n2) AS BIGINT) AS n_late,
           CAST(FLOOR(1000000.0 * CAST(MAX(num) AS DOUBLE)
                / (CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE))
                + 0.5) AS BIGINT) AS ks_ppm
    FROM dist WHERE n1 > 0 AND n2 > 0 GROUP BY event_type
    """,
)
def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic per event type:
    split the events stream at its temporal midpoint and measure the
    largest ECDF gap between the early and late value distributions —
    the distribution-drift monitor a CDC consumer runs to catch upstream
    semantic changes that row counts and checksums miss (complements
    the reference's count/lag metrics, `src/monitoring/metrics.py`).

    Exact-integer core: at every observed value x, |F1(x) - F2(x)| =
    |c1*n2 - c2*n1| / (n1*n2); the numerator is maximized in widened
    integer arithmetic (Spark decimal(38,0), DuckDB HUGEINT — c1*n2
    overflows int64 once both halves pass ~3e9 rows) so the argmax is
    exact, and only the final reported ratio is micro-quantized through
    a mirrored double expression. Plan: one scan -> (type, cent) counts
    with the early/late split folded into the same aggregation, cumsums
    over the per-type distinct-value table (distribution-sized, not
    data-sized), then a per-type max. The temporal midpoint is a 1-row
    broadcast scalar."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("vc"),
            F.unix_millis("ts").alias("ts_ms"),
        )
    )
    mid = ev.agg(
        F.expr("(MIN(ts_ms) + MAX(ts_ms)) DIV 2").alias("m")
    )
    pt = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("event_type", "vc")
        .agg(
            F.sum(F.when(F.col("ts_ms") <= F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("d1"),
            F.sum(F.when(F.col("ts_ms") <= F.col("m"), 0).otherwise(1))
            .cast("long")
            .alias("d2"),
        )
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = pt.select(
        "event_type",
        F.sum("d1").over(w_cum).alias("c1"),
        F.sum("d2").over(w_cum).alias("c2"),
        F.sum("d1").over(w_all).alias("n1"),
        F.sum("d2").over(w_all).alias("n2"),
    )
    dist = cum.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        "event_type",
        "n1",
        "n2",
        F.abs(
            F.col("c1").cast("decimal(38,0)")
            * F.col("n2").cast("decimal(38,0)")
            - F.col("c2").cast("decimal(38,0)")
            * F.col("n1").cast("decimal(38,0)")
        ).alias("num"),
    )
    return dist.groupBy("event_type").agg(
        F.max("n1").cast("long").alias("n_early"),
        F.max("n2").cast("long").alias("n_late"),
        F.floor(
            F.lit(1000000.0)
            * F.max("num").cast("double")
            / (
                F.max("n1").cast("double")
                * F.max("n2").cast("double")
            )
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ks_ppm"),
    )


@query(
    "q_skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS count_star,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_price_cents,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_order,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_order
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED two-phase aggregation, driver-verified equal to the flat
    GROUP BY: l_returnflag has 3 values over the whole fact table —
    exactly the power-law-key shape where one reducer per key
    straggles at 100 TB. ``functions/skew.py:salted_aggregate``
    scatters each key over 8 deterministic row-hash salts (partial
    combine per (key, salt), final merge per key); the oracle is the
    PLAIN single-phase SQL, so the equality check is the proof that
    salting changes the schedule, never the answer — the same claim
    the unit tests pin, now under the driver's value-hash gate. All
    aggregates here are decomposable (count/sum/min/max) and
    exact-integer."""
    from scylla_pg_cdc_spark.functions.skew import salted_aggregate

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
    )
    out = salted_aggregate(
        li,
        ["l_returnflag"],
        {"*": "count", "qty": "sum", "price_c": "sum"},
        n_salt=8,
    )
    mm = salted_aggregate(
        li, ["l_returnflag"], {"l_orderkey": "min"}, n_salt=8
    ).join(
        salted_aggregate(
            li, ["l_returnflag"], {"l_orderkey": "max"}, n_salt=8
        ),
        "l_returnflag",
    )
    return (
        out.join(mm, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("count_*").alias("count_star"),
            F.col("sum_qty").cast("long").alias("sum_qty"),
            F.col("sum_price_c").cast("long").alias("sum_price_cents"),
            F.col("min_l_orderkey").cast("long").alias("min_order"),
            F.col("max_l_orderkey").cast("long").alias("max_order"),
        )
    )


# Benford first-digit expectation log10(1 + 1/d), in exact ppm
# (public constants, rounded half-up once here, used by both engines)
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def _benford_case_sql() -> str:
    return (
        "CASE first_digit "
        + " ".join(
            f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
        )
        + " END"
    )


@query(
    "q_benford_audit",
    oracle=f"""
    WITH d AS (
        SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice * 100.0 + 0.5)
                                    AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS first_digit
        FROM orders WHERE o_totalprice > 0
    ), c AS (
        SELECT first_digit, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(COUNT(*)) OVER () AS total
        FROM d GROUP BY first_digit
    )
    SELECT first_digit, n,
           CAST((1000000 * n) // total AS BIGINT) AS observed_ppm,
           CAST({_benford_case_sql()} AS BIGINT) AS benford_ppm,
           CAST(ABS((1000000 * n) // total - {_benford_case_sql()})
                AS BIGINT) AS abs_dev_ppm
    FROM c
    """,
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: observed first-digit
    shares vs the Benford expectation log10(1+1/d) — the classic
    fabricated-or-truncated-data tripwire for financial columns
    (naturally-grown amounts follow Benford; capped, generated, or
    hand-entered ones don't). Digits come from the exact integer cents
    string, shares are exact ppm, and the expectation is a shared
    integer constant table — no logarithm is evaluated at query time,
    keeping the repo's no-libm portability rule. One digit-keyed
    aggregation (9 groups); the deviation column is what a monitor
    thresholds."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("first_digit")
    )
    c = d.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n"))
    total_w = Window.partitionBy()
    bexpr = (
        "CASE first_digit "
        + " ".join(f"WHEN {dd} THEN {p}" for dd, p in _BENFORD_PPM.items())
        + " END"
    )
    return (
        c.withColumn("total", F.sum("n").over(total_w))
        .select(
            "first_digit",
            F.col("n").cast("long").alias("n"),
            F.expr("CAST((1000000 * n) DIV total AS BIGINT)").alias(
                "observed_ppm"
            ),
            F.expr(f"CAST({bexpr} AS BIGINT)").alias("benford_ppm"),
            F.expr(
                f"CAST(ABS((1000000 * n) DIV total - {bexpr}) AS BIGINT)"
            ).alias("abs_dev_ppm"),
        )
    )
