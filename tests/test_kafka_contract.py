"""Kafka connector contract test (VERDICT r1 next-round #7).

Parses the REFERENCE's real connector configs and checks them
field-for-field against our translation layer
(`sources/kafka.py`). Drift fails in either direction:

- a connector key with no disposition entry => the reference moved and
  our translation is stale;
- a disposition entry whose key vanished from the connector => our
  table claims a mapping that no longer exists;
- a 'mapped' value that doesn't flow into the generated Spark config
  => the translation silently dropped a tuning knob.

Pattern mirrors the reference's own contract suite
(`tests/contract/test_scylla_connector.py:49-194`), which asserts the
connector template's semantic fields rather than exact bytes.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from scylla_pg_cdc_spark.sources.kafka import (
    SINK_KEY_DISPOSITION,
    SOURCE_KEY_DISPOSITION,
    sink_params_from_connector,
    source_options_from_connector,
    source_runtime_from_connector,
)

CONNECTORS = Path("/root/reference/docker/kafka-connect/connectors")

# Kafka Connect SMT/predicate chains fan out into per-transform keys
# (transforms.<name>.<prop>); the whole chain is rebuilt as DataFrame
# transforms in sources/envelope.py, so any such key is 'smt'.
SMT_PREFIXES = ("transforms.", "predicates.")


def _load(name: str) -> dict[str, object]:
    path = CONNECTORS / name
    if not path.exists():
        pytest.skip(f"reference connector {name} not present")
    return json.loads(path.read_text())["config"]


def _classify(cfg: dict[str, object], disposition: dict[str, str]) -> None:
    unclassified = [
        k
        for k in cfg
        if k not in disposition and not k.startswith(SMT_PREFIXES)
    ]
    assert not unclassified, (
        f"reference connector keys with no disposition (reference "
        f"drifted under us): {unclassified}"
    )
    stale = [
        k
        for k in disposition
        if k not in cfg and not k.startswith(SMT_PREFIXES)
    ]
    assert not stale, (
        f"disposition entries for keys the reference no longer has "
        f"(our table drifted): {stale}"
    )


def test_source_connector_fully_classified():
    _classify(_load("scylla-source.json"), SOURCE_KEY_DISPOSITION)


def test_sink_connector_fully_classified():
    _classify(_load("postgres-sink.json"), SINK_KEY_DISPOSITION)


def test_source_mapped_values_flow_into_spark_options():
    cfg = _load("scylla-source.json")
    opts = source_options_from_connector(cfg, bootstrap_servers="kafka:9092")
    # topic namespace: scylla.name + keyspace + every table name
    assert opts["subscribePattern"].startswith("scylla-cluster\\.")
    for table in str(cfg["scylla.table.names"]).split(","):
        assert table.split(".", 1)[1] in opts["subscribePattern"]
    # batch sizing: max.batch.size scaled by tasks.max
    assert opts["maxOffsetsPerTrigger"] == str(
        int(str(cfg["max.batch.size"])) * int(str(cfg["tasks.max"]))
    )
    # snapshot.mode=initial => replay from the beginning
    assert opts["startingOffsets"] == "earliest"
    # errors.tolerance=all => don't kill the query on missing offsets
    assert opts["failOnDataLoss"] == "false"
    # idempotent producer upstream => read_committed consumer
    assert opts["kafka.isolation.level"] == "read_committed"

    rt = source_runtime_from_connector(cfg)
    assert rt["trigger_processing_time_ms"] == int(str(cfg["poll.interval.ms"]))
    assert rt["heartbeat_interval_sec"] == 1  # heartbeat.interval.ms=1000
    assert rt["dlq_name"] == cfg["errors.deadletterqueue.topic.name"]


def test_sink_mapped_values_match_pipeline_defaults():
    """The reference sink's retry/merge knobs must equal the values our
    pipeline actually defaults to — if either side changes, this
    breaks."""
    import inspect

    from scylla_pg_cdc_spark.streaming.pipeline import run_upsert_pipeline

    cfg = _load("postgres-sink.json")
    params = sink_params_from_connector(cfg)
    sig = inspect.signature(run_upsert_pipeline)
    assert params["max_retries"] == sig.parameters["max_retries"].default
    assert params["backoff_ms"] == sig.parameters["backoff_ms"].default
    assert params["keep_deleted"] is True       # delete.enabled
    assert params["strict_schema"] is True      # auto.evolve=false
    assert params["timezone"] == "UTC"
    assert params["escalate_to_dlq"] is True    # errors.tolerance=all
    assert params["read_committed"] is True
    assert params["offsets_via_checkpoint"] is True
    assert params["dlq_name"] == "dlq-postgres-sink"


def test_sink_rejects_non_upsert_modes():
    cfg = dict(_load("postgres-sink.json"))
    cfg["insert.mode"] = "insert"
    with pytest.raises(ValueError, match="upsert"):
        sink_params_from_connector(cfg)


def test_sink_smt_chain_is_rebuilt_in_envelope():
    """Every SMT type the reference sink declares has a DataFrame
    counterpart in sources/envelope.py."""
    import scylla_pg_cdc_spark.sources.envelope as env

    cfg = _load("postgres-sink.json")
    smt_types = {
        str(v).rsplit(".", 1)[-1]
        for k, v in cfg.items()
        if k.startswith("transforms.") and k.endswith(".type")
    }
    counterparts = {
        "ExtractNewRecordState": env.unwrap_after,
        "Flatten$Value": env.flatten_payload,
        "ReplaceField$Value": env.rename_fields,
        "RegexRouter": env.route_by_regex,
    }
    missing = smt_types - set(counterparts)
    assert not missing, f"SMT types with no envelope.py counterpart: {missing}"
