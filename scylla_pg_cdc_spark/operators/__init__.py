"""Operator builders. Each module registers checkable queries in
``scylla_pg_cdc_spark.registry`` at import time."""
