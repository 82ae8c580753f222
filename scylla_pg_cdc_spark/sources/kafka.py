"""Kafka source/sink configuration surface.

No broker exists in the test container, so this module only *builds*
the readStream/writeStream configuration that mirrors the reference
connectors (`docker/kafka-connect/connectors/scylla-source.json`,
`postgres-sink.json`); `read_kafka_stream` raises a clear error if the
kafka-sql jar is absent. The rest of the pipeline is source-agnostic:
`to_change_events`/`merge_batch_into_state` consume any DataFrame with
the envelope columns, so swapping the file source for Kafka is config,
not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_source_options(
    bootstrap_servers: str,
    topic_pattern: str = "scylla-cluster\\.app_data\\..*",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 3000,
) -> dict[str, str]:
    """readStream options mirroring the source connector's tuning:
    subscribePattern ~ the RegexRouter topic space, maxOffsetsPerTrigger
    ~ `max.batch.size`/sink `batch.size` (1000-3000 healthy band,
    `docs/pipeline_throughput_analysis.md:515`), failOnDataLoss=false ~
    `errors.tolerance=all`."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribePattern": topic_pattern,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
        "kafka.isolation.level": "read_committed",  # postgres-sink.json:105
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_kafka_stream(
    spark: SparkSession, bootstrap_servers: str, **kwargs
) -> DataFrame:
    """Kafka changelog stream: (topic, key, value, timestamp ...).
    Requires the spark-sql-kafka package on the classpath."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, **kwargs).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka package "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>); "
            "not bundled in this environment"
        ) from e
