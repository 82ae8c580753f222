"""Constraint engine: exact violation counts on deliberately dirty
data (the clean-testdata query q_constraint_audit only proves zeros;
this proves the counting)."""

from __future__ import annotations

from scylla_pg_cdc_spark.functions import constraints as C


def _audit_map(spark, tables, rules):
    rows = C.audit(tables, rules).collect()
    return {r["rule"]: r["n_violations"] for r in rows}


def test_each_rule_kind_counts_exactly(spark):
    child = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (1, -5.0, "A"),     # dup id=1; negative value
            (2, None, "B"),     # null value
            (3, 150.0, "C"),    # out of range; bad status; orphan parent
            (3, 50.0, "C"),     # dup id=3; bad status; orphan parent
        ],
        "id long, value double, status string",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pid long")
    tables = {"child": child, "parent": parent}
    rules = [
        C.not_null("value_not_null", "child", "value"),
        C.accepted_range("value_range", "child", "value", 0.0, 100.0),
        C.accepted_values("status_domain", "child", "status", "A", "B"),
        C.expression("value_negative", "child", "value < 0"),
        C.unique("id_unique", "child", "id"),
        C.foreign_key("child_parent_fk", "child", ("id",), "parent", ("pid",)),
    ]
    got = _audit_map(spark, tables, rules)
    assert got == {
        "value_not_null": 1,      # id=2
        "value_range": 3,         # null, -5, 150
        "status_domain": 2,       # the two C rows
        "value_negative": 1,
        "id_unique": 2,           # one extra copy each of id 1 and 3
        "child_parent_fk": 2,     # both id=3 rows orphaned
    }


def test_row_local_rules_fuse_into_one_scan(spark):
    """All row-local rules on one table must compile to a single
    aggregate over a single scan (one pass, not one scan per rule)."""
    df = spark.createDataFrame([(1, 5.0)], "id long, value double")
    rules = [
        C.not_null("a", "t", "value"),
        C.accepted_range("b", "t", "value", 0.0, 10.0),
        C.expression("c", "t", "value < 0"),
    ]
    out = C.audit({"t": df}, rules)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # 3 rule rows but only one aggregate subtree feeding them
    assert plan.count("Aggregate") <= 3  # union of projections over ONE agg
    assert out.count() == 3


def test_violations_returns_offending_rows(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "id long, value double"
    )
    rule = C.accepted_range("r", "t", "value", 0.0, 10.0)
    bad = C.violations({"t": df}, rule).collect()
    assert sorted(r["id"] for r in bad) == [2, 3]
