"""SMT-chain tests: envelope parse -> unwrap -> flatten -> rename ->
route, heartbeat/tombstone predicates (reference contract coverage,
`tests/contract/test_scylla_connector.py:49-194` analog)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from scylla_pg_cdc_spark.sources.envelope import (
    DEFAULT_RENAMES,
    add_cdc_metadata,
    drop_heartbeats,
    drop_tombstone_records,
    flatten_payload,
    parse_envelope,
    rename_fields,
    route_by_regex,
    unwrap_after,
)


def make_event(op, pk, before, after, ts_us=1_700_000_000_000_000):
    return json.dumps(
        {
            "correlation_id": f"corr-{pk}",
            "operation": op,
            "table_name": "users",
            "primary_key": {"user_id": str(pk)},
            "before": before,
            "after": after,
            "commit_timestamp": ts_us,
            "captured_at": ts_us // 1000,
            "schema_version": 1,
        }
    )


def raw_stream(spark):
    rows = [
        ("scylla-cluster.app_data.users",
         make_event("INSERT", 1, None,
                    {"user_id": "1", "email_value": "a@x.com",
                     "name_value": "alice", "status_value": "active"})),
        ("scylla-cluster.app_data.users",
         make_event("UPDATE", 1, {"user_id": "1", "email_value": "a@x.com"},
                    {"user_id": "1", "email_value": "a2@x.com",
                     "name_value": "alice", "status_value": "active"})),
        ("scylla-cluster.app_data.users",
         make_event("DELETE", 2, {"user_id": "2", "email_value": "b@x.com",
                                  "name_value": "bob", "status_value": "old"},
                    None)),
        ("heartbeat.scylla", None),
        ("scylla-cluster.app_data.users", None),  # kafka tombstone
    ]
    return spark.createDataFrame(rows, "topic string, value string")


def test_full_smt_chain(spark):
    df = raw_stream(spark)
    df = drop_heartbeats(df)
    assert df.count() == 4
    df = drop_tombstone_records(df)
    assert df.count() == 3
    df = parse_envelope(df)
    df = route_by_regex(df, "topic", r"scylla-cluster\.app_data\.(.*)")
    unwrapped = unwrap_after(df.select("route", "event"))
    flat = flatten_payload(
        unwrapped,
        ["user_id", "email_value", "name_value", "status_value"],
    )
    renamed = rename_fields(flat, DEFAULT_RENAMES)
    final = add_cdc_metadata(renamed, source="scylla-cluster", stream_id="s-1")

    rows = final.collect()
    assert {r["cdc_operation"] for r in rows} == {"INSERT", "UPDATE", "DELETE"}
    by_op = {r["cdc_operation"]: r for r in rows}
    # unwrap takes after-image for upserts, before-image for deletes
    assert by_op["UPDATE"]["email"] == "a2@x.com"
    assert by_op["DELETE"]["email"] == "b@x.com"
    assert by_op["DELETE"]["__deleted"] is True
    assert by_op["INSERT"]["__deleted"] is False
    # commit_timestamp us -> ms
    assert by_op["INSERT"]["cdc_timestamp_ms"] == 1_700_000_000_000
    assert by_op["INSERT"]["cdc_source"] == "scylla-cluster"
    assert set(final.columns) >= {
        "correlation_id", "cdc_operation", "user_id", "email", "name",
        "status", "cdc_timestamp_ms", "__deleted", "cdc_source",
        "cdc_stream_id",
    }


def test_smt_chain_is_narrow(spark):
    """The whole SMT chain must be shuffle-free (single stage)."""
    df = parse_envelope(drop_tombstone_records(drop_heartbeats(raw_stream(spark))))
    final = rename_fields(
        flatten_payload(
            unwrap_after(
                route_by_regex(df, "topic", r"scylla-cluster\.app_data\.(.*)")
                .select("route", "event")
            ),
            ["user_id", "email_value"],
        ),
        DEFAULT_RENAMES,
    )
    plan = final._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_route_extraction(spark):
    df = route_by_regex(
        raw_stream(spark), "topic", r"scylla-cluster\.app_data\.(.*)"
    )
    routes = {r["route"] for r in df.collect()}
    assert routes == {"users", ""}  # heartbeat rows extract empty


def test_correlation_ids_are_unique(spark):
    from scylla_pg_cdc_spark.sources.envelope import with_correlation_id

    df = with_correlation_id(spark.range(5000))
    rows = df.collect()
    ids = [r["correlation_id"] for r in rows]
    assert len(set(ids)) == 5000
    assert all(len(i) == 36 and i.count("-") == 4 for i in ids)
