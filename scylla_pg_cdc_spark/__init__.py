"""scylla_pg_cdc_spark — a PySpark-native analytics + CDC engine.

A from-scratch Spark rebuild of the capability surface of the reference
CDC pipeline (ScyllaDB -> Kafka -> Postgres warehouse + reconciliation
engine; see SURVEY.md). Everything is expressed DataFrame-first so
Catalyst/Tungsten/AQE pick the physical plan:

- ``sources``    — batch/stream table loaders (parquet; CDC changelog).
- ``operators``  — relational / window / reconciliation / CDC / text /
                   vector operator builders, each returning a DataFrame.
- ``functions``  — column-expression libraries (tolerant comparisons,
                   money math) and driver-side utilities (schema
                   evolution checker, metrics).
- ``streaming``  — Structured Streaming pipelines (upsert compaction,
                   DLQ routing, windowed rates).
- ``registry``   — the query registry that backs ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
