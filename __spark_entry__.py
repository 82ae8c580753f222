"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over ``scylla_pg_cdc_spark.registry``: every operator
module registers its checkable queries (builder + DuckDB oracle SQL)
there; this file only aggregates them. See SURVEY.md §2B for the
declared inventory.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from scylla_pg_cdc_spark.registry import load_all  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full CDC
    materialization — events as a change stream, compacted to latest
    state per user, 'error' as delete tombstone, joined to customer
    dims, aggregated (SURVEY.md §2B flagship)."""
    from scylla_pg_cdc_spark.operators.cdc import cdc_pipeline_flagship

    return cdc_pipeline_flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
