"""Temporal join operators: as-of join edge semantics (the union-window
construction) + cross-validation of both query faces happens in the
oracle gate (q_asof_join runs against DuckDB's NATIVE ASOF JOIN)."""

from __future__ import annotations

from scylla_pg_cdc_spark.operators.temporal import asof_join, asof_join_forward


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_tiebreak_picks_min_id_both_directions(spark):
    """Several right rows on the same (key, ts): with right_tiebreak
    the MIN tiebreak must win deterministically in BOTH directions —
    the rule the DuckDB oracles replicate by pre-reducing to
    MIN(event_id) per (key, ts). Shuffled input orders (repartition)
    must not change the pick."""
    left = _df(spark, [(1, 100), (1, 300)], "k long, lts long")
    right = _df(
        spark,
        # three ties at ts=100 and two at ts=300, ids deliberately
        # out of order
        [(1, 100, 9, "i9"), (1, 100, 3, "i3"), (1, 100, 7, "i7"),
         (1, 300, 5, "i5"), (1, 300, 2, "i2")],
        "rk long, rts long, rid long, v string",
    ).repartition(8)
    back = {
        r["lts"]: (r["rid"], r["v"])
        for r in asof_join(
            left, right, "k", "rk", "lts", "rts", ["rid", "v"],
            right_tiebreak="rid",
        ).collect()
    }
    assert back == {100: (3, "i3"), 300: (2, "i2")}
    fwd = {
        r["lts"]: (r["rid"], r["v"])
        for r in asof_join_forward(
            left, right, "k", "rk", "lts", "rts", ["rid", "v"],
            right_tiebreak="rid",
        ).collect()
    }
    assert fwd == {100: (3, "i3"), 300: (2, "i2")}


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


def test_scd2_intervals_partition_history(spark):
    """SCD2 invariants: per key, intervals are disjoint, chained
    (valid_to == next valid_from), exactly one open interval, and the
    interval count equals the event count."""
    from scylla_pg_cdc_spark.operators.cdc import q_scd2_history
    from scylla_pg_cdc_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    hist = q_scd2_history(spark, SF_SMALL).collect()
    events = load_table(spark, SF_SMALL, "events")
    assert len(hist) == events.count()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["user_id"], []).append(r)
    for rows in by_key.values():
        rows.sort(key=lambda r: (r["valid_from_ms"], r["event_id"]))
        opens = [r for r in rows if r["is_current"]]
        assert len(opens) == 1 and rows[-1]["is_current"]
        for cur, nxt in zip(rows, rows[1:]):
            assert not cur["is_current"] and cur["valid_to_ms"] == nxt["valid_from_ms"]
        assert all(r["valid_to_ms"] == -1 for r in opens)


def test_state_asof_equals_scd2_interval_lookup(spark):
    """Point-in-time lookup == the SCD2 interval covering t: the two
    temporal faces must agree on the state at the pinned timestamp."""
    from scylla_pg_cdc_spark.operators.cdc import (
        _ASOF_MS,
        q_scd2_history,
        q_state_asof,
    )
    from tests.conftest import SF_SMALL

    asof = {
        r["user_id"]: r["event_id"]
        for r in q_state_asof(spark, SF_SMALL).collect()
    }
    hist = q_scd2_history(spark, SF_SMALL).collect()
    covering = {}
    for r in hist:
        if r["valid_from_ms"] <= _ASOF_MS and (
            r["valid_to_ms"] == -1 or _ASOF_MS < r["valid_to_ms"]
        ):
            # ties on valid_from resolve to the larger event_id (the
            # later write wins, mirroring the compaction order)
            k = r["user_id"]
            if k not in covering or r["event_id"] > covering[k]:
                covering[k] = r["event_id"]
    assert asof == covering and len(asof) > 0
