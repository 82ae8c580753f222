"""Warehouse data-quality audit — the checked query face of the
declarative constraint engine (``functions/constraints.py``).

Reference anchor: ``tests/validation/warehouse_checks.sql`` runs
hand-written probes (row counts, orphans, nulls); this runs the same
checks as a RULE SET compiled to fused aggregate scans + anti joins,
one summary row per rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
