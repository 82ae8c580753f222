"""Temporal join operators: as-of join edge semantics (the union-window
construction) + cross-validation of both query faces happens in the
oracle gate (q_asof_join runs against DuckDB's NATIVE ASOF JOIN)."""

from __future__ import annotations

from scylla_pg_cdc_spark.operators.temporal import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_picks_latest_at_or_before(spark):
    left = _df(spark, [(1, 100), (1, 250), (1, 50)], "k long, lts long")
    right = _df(
        spark,
        [(1, 90, "a"), (1, 200, "b"), (1, 240, "c"), (1, 300, "d")],
        "rk long, rts long, v string",
    )
    out = {
        (r["k"], r["lts"]): r["v"]
        for r in asof_join(
            left, right, "k", "rk", "lts", "rts", ["v"]
        ).collect()
    }
    assert out == {(1, 100): "a", (1, 250): "c", (1, 50): None}


def test_asof_equal_timestamp_is_visible(spark):
    """DuckDB ASOF uses >=: a right row at exactly the left ts wins."""
    left = _df(spark, [(7, 500)], "k long, lts long")
    right = _df(spark, [(7, 500, "same")], "rk long, rts long, v string")
    row = asof_join(left, right, "k", "rk", "lts", "rts", ["v"]).head()
    assert row["v"] == "same"


def test_asof_keys_do_not_leak(spark):
    """A right row for another key must never be carried over."""
    left = _df(spark, [(1, 100), (2, 100)], "k long, lts long")
    right = _df(spark, [(1, 50, "one")], "rk long, rts long, v string")
    out = {
        r["k"]: r["v"]
        for r in asof_join(
            left, right, "k", "rk", "lts", "rts", ["v"]
        ).collect()
    }
    assert out == {1: "one", 2: None}


def test_asof_single_shuffle_plan(spark):
    """The construction must stay one window shuffle — no join node."""
    left = _df(spark, [(1, 100)], "k long, lts long")
    right = _df(spark, [(1, 50, "x")], "rk long, rts long, v string")
    plan = (
        asof_join(left, right, "k", "rk", "lts", "rts", ["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
