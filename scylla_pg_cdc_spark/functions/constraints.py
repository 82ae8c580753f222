"""Declarative data-quality constraints compiled to Spark plans.

The reference validates its warehouse with hand-written SQL probes
(``tests/validation/warehouse_checks.sql``: row counts, orphan checks,
null checks); this module generalizes those probes into a rule set —
the dbt-test / Great-Expectations surface — where each rule compiles
to the cheapest distributed plan for its kind:

- ``not_null`` / ``accepted_range`` / ``accepted_values`` /
  ``expression``: ONE conditional-sum aggregate each; all such rules
  on the same table FUSE into a single scan (one pass, one row out).
- ``unique``: one groupBy on the key with a HAVING count>1 — the
  duplicate-detection shape (map-side partial combine).
- ``foreign_key``: left-anti join child->parent counting orphans —
  broadcast when the parent is dim-sized.

``audit`` returns one row per rule (rule, kind, n_violations), so the
whole quality gate is a small union of aggregates — at 100 TB the
dominant cost is one scan per table plus one keyed join per FK rule,
and nothing ever collects row-level violations unless asked
(``violations`` returns the offending rows for ONE rule, bounded by
``limit``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    table: str
    cols: tuple[str, ...] = ()
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    expr: str | None = None  # SQL boolean: TRUE == violation
    ref_table: str | None = None
    ref_cols: tuple[str, ...] = ()


def not_null(name: str, table: str, col: str) -> Rule:
    return Rule(name, "not_null", table, (col,))


def unique(name: str, table: str, *cols: str) -> Rule:
    return Rule(name, "unique", table, tuple(cols))


def accepted_range(
    name: str, table: str, col: str, lo: float, hi: float
) -> Rule:
    return Rule(name, "accepted_range", table, (col,), lo=lo, hi=hi)


def accepted_values(name: str, table: str, col: str, *values) -> Rule:
    return Rule(name, "accepted_values", table, (col,), values=tuple(values))


def expression(name: str, table: str, violation_sql: str) -> Rule:
    return Rule(name, "expression", table, expr=violation_sql)


def foreign_key(
    name: str, table: str, cols: tuple[str, ...],
    ref_table: str, ref_cols: tuple[str, ...],
) -> Rule:
    return Rule(
        name, "foreign_key", table, tuple(cols),
        ref_table=ref_table, ref_cols=tuple(ref_cols),
    )


def _violation_col(rule: Rule) -> Column:
    c = F.col(rule.cols[0]) if rule.cols else None
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "accepted_range":
        return c.isNull() | (c < F.lit(rule.lo)) | (c > F.lit(rule.hi))
    if rule.kind == "accepted_values":
        return c.isNull() | ~c.isin(list(rule.values))
    if rule.kind == "expression":
        return F.expr(rule.expr)
    raise ValueError(f"not a row-local rule: {rule.kind}")


def audit(
    tables: dict[str, DataFrame],
    rules: list[Rule],
    broadcast_parents: bool = True,
) -> DataFrame:
    """One row per rule: (rule, kind, n_violations). Row-local rules
    against the same table fuse into a single aggregate scan.

    ``broadcast_parents`` hints the FK parent side for broadcast; it
    defaults True because FK parents are typically dim-sized, but MUST
    be False when a parent is fact-sized (e.g. a lineitem->orders
    check at 100 TB) — the anti-join then falls back to a shuffled
    hash/sort-merge join instead of OOMing the driver. An empty rule
    list returns an empty (rule, kind, n_violations) frame."""
    if not rules:
        if not tables:
            raise ValueError("audit() needs at least one table or rule")
        return next(iter(tables.values())).sparkSession.createDataFrame(
            [], "rule string, kind string, n_violations long"
        )
    out: list[DataFrame] = []

    row_local = [
        r for r in rules
        if r.kind in ("not_null", "accepted_range", "accepted_values",
                      "expression")
    ]
    by_table: dict[str, list[Rule]] = {}
    for r in row_local:
        by_table.setdefault(r.table, []).append(r)
    for table, rs in by_table.items():
        agg = tables[table].agg(
            *[
                F.sum(_violation_col(r).cast("long")).alias(r.name)
                for r in rs
            ]
        )
        for r in rs:
            out.append(
                agg.select(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.coalesce(F.col(r.name), F.lit(0))
                    .cast("long")
                    .alias("n_violations"),
                )
            )

    for r in rules:
        if r.kind == "unique":
            dupes = (
                tables[r.table]
                .groupBy(*r.cols)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                    .cast("long")
                    .alias("n_violations")
                )
            )
            out.append(
                dupes.select(
                    F.lit(r.name).alias("rule"),
                    F.lit("unique").alias("kind"),
                    "n_violations",
                )
            )
        elif r.kind == "foreign_key":
            child = tables[r.table]
            parent = tables[r.ref_table].select(
                *[
                    F.col(rc).alias(c)
                    for c, rc in zip(r.cols, r.ref_cols)
                ]
            ).distinct()
            if broadcast_parents:
                parent = F.broadcast(parent)
            orphans = (
                child.join(parent, list(r.cols), "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            )
            out.append(
                orphans.select(
                    F.lit(r.name).alias("rule"),
                    F.lit("foreign_key").alias("kind"),
                    "n_violations",
                )
            )

    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def violations(
    tables: dict[str, DataFrame], rule: Rule, limit: int = 100
) -> DataFrame:
    """Offending rows for one rule (row-local kinds), bounded."""
    return (
        tables[rule.table].filter(_violation_col(rule)).limit(limit)
    )
