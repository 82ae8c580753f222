"""Sources: batch table loaders and CDC changelog readers."""

from scylla_pg_cdc_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["TABLE_NAMES", "load_table", "load_tables"]
