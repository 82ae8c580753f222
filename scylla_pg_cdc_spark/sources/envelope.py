"""Change-event envelope codec + single-message transform (SMT) chain.

The reference's sink applies a Kafka-Connect SMT chain to every record
(`docker/kafka-connect/connectors/postgres-sink.json:37-115`):
ExtractNewRecordState (unwrap) -> Flatten -> ReplaceField (17 renames)
-> RegexRouter, plus heartbeat/tombstone predicates, over Avro
envelopes shaped like `specs/001-scylla-pg-cdc/data-model.md:16-85`
(correlation_id, operation, table_name, primary_key, before, after,
commit_timestamp us, captured_at ms, schema_version).

Here the default envelope is JSON; the Avro wire format lives in
``sources/avro_codec.py`` (JVM from_avro/to_avro when the spark-avro
package is loadable, stdlib binary codec otherwise — swap
``parse_envelope`` for ``avro_codec.parse_envelope_avro``). Every SMT
is a DataFrame transform: narrow, zero-shuffle, whole-stage codegen —
verified single-stage plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

ENVELOPE_SCHEMA = StructType(
    [
        StructField("correlation_id", StringType()),
        StructField("operation", StringType()),  # INSERT|UPDATE|DELETE|TRUNCATE
        StructField("table_name", StringType()),
        StructField("primary_key", MapType(StringType(), StringType())),
        StructField("before", MapType(StringType(), StringType())),
        StructField("after", MapType(StringType(), StringType())),
        StructField("commit_timestamp", LongType()),  # microseconds
        StructField("captured_at", LongType()),  # milliseconds
        StructField("schema_version", IntegerType()),
    ]
)

OPERATIONS = ("INSERT", "UPDATE", "DELETE", "TRUNCATE")


def parse_envelope(df: DataFrame, json_col: str = "value") -> DataFrame:
    """Deserialize the change-event envelope (S3 analog of the Avro
    converter). Swap for from_avro when the spark-avro jar ships."""
    return df.withColumn("event", F.from_json(F.col(json_col), ENVELOPE_SCHEMA))


def to_envelope_json(df: DataFrame, event_col: str = "event") -> Column:
    return F.to_json(F.col(event_col))


def unwrap_after(df: DataFrame, event_col: str = "event") -> DataFrame:
    """ExtractNewRecordState (P1): project the after-image + metadata;
    DELETE keeps the before-image keyed fields for tombstone rewrite
    (`postgres-sink.json:39-41`)."""
    e = F.col(event_col)
    return df.select(
        e.getField("correlation_id").alias("correlation_id"),
        e.getField("operation").alias("cdc_operation"),
        e.getField("table_name").alias("table_name"),
        e.getField("primary_key").alias("primary_key"),
        F.when(
            e.getField("operation") == "DELETE", e.getField("before")
        ).otherwise(e.getField("after")).alias("payload"),
        (e.getField("commit_timestamp") / F.lit(1000)).cast("long").alias(
            "cdc_timestamp_ms"
        ),
        (e.getField("operation") == "DELETE").alias("__deleted"),
    )


def flatten_payload(df: DataFrame, fields: list[str],
                    payload_col: str = "payload", delimiter: str = "_") -> DataFrame:
    """Flatten (P2): promote map entries to `parent_child` columns
    with the reference's '_' delimiter (`postgres-sink.json:43-44`)."""
    cols = [c for c in df.columns if c != payload_col]
    flat = [
        F.col(payload_col).getItem(f).alias(f.replace(".", delimiter))
        for f in fields
    ]
    return df.select(*cols, *flat)


def rename_fields(df: DataFrame, renames: dict[str, str]) -> DataFrame:
    """ReplaceField rename chain (P3) — the sink renames 17 columns
    like email_value->email (`postgres-sink.json:46-92`)."""
    out = df
    for old, new in renames.items():
        if old in out.columns:
            out = out.withColumnRenamed(old, new)
    return out


def route_by_regex(df: DataFrame, source_col: str, pattern: str,
                   target_col: str = "route") -> DataFrame:
    """RegexRouter (P4): extract the route (table name) from a topic
    string, e.g. r'scylla-cluster\\.app_data\\.(.*)'
    (`postgres-sink.json:94-96`)."""
    return df.withColumn(
        target_col, F.regexp_extract(F.col(source_col), pattern, 1)
    )


def drop_heartbeats(df: DataFrame, topic_col: str = "topic") -> DataFrame:
    """Heartbeat predicate (P5): skip topics matching 'heartbeat.*'
    (`scylla-source.json:54-56`)."""
    return df.filter(~F.col(topic_col).rlike("^heartbeat"))


def drop_tombstone_records(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka-level tombstone predicate (P6): null-value records
    (`postgres-sink.json:115`) — distinct from CDC DELETEs."""
    return df.filter(F.col(value_col).isNotNull())


def add_cdc_metadata(df: DataFrame, source: str, stream_id: str) -> DataFrame:
    """Target-table CDC metadata columns (`init.sql:19-146`:
    __deleted, cdc_operation, cdc_timestamp, cdc_source,
    cdc_stream_id)."""
    return df.withColumn("cdc_source", F.lit(source)).withColumn(
        "cdc_stream_id", F.lit(stream_id)
    )


# The sink's rename table for the users stream (postgres-sink.json:46-92
# pattern: <field>_value -> <field>)
DEFAULT_RENAMES = {
    "email_value": "email",
    "name_value": "name",
    "status_value": "status",
    "created_at_value": "created_at",
    "updated_at_value": "updated_at",
}


def with_correlation_id(df: DataFrame, col_name: str = "correlation_id") -> DataFrame:
    """UUID4 correlation-id generation (F13,
    `src/utils/correlation.py:22-31`): one distributed-unique id per
    record for end-to-end tracing. Non-deterministic by design."""
    return df.withColumn(col_name, F.expr("uuid()"))
