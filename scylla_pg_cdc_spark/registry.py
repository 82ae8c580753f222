"""Central query registry backing ``__spark_entry__.py``.

Every operator module registers its checkable queries here with the
``@query`` decorator; ``__spark_entry__.py`` is then a thin re-export.
Each entry pairs a DataFrame builder ``fn(spark, sf_dir)`` with the
equivalent DuckDB oracle SQL (or ``None`` for non-SQL-expressible ops,
which the driver checks rows-only).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None => rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the builder for query ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration)."""
    import scylla_pg_cdc_spark.operators.relational  # noqa: F401
    import scylla_pg_cdc_spark.operators.subqueries  # noqa: F401
    import scylla_pg_cdc_spark.operators.aggregates  # noqa: F401
    import scylla_pg_cdc_spark.operators.windows  # noqa: F401
    import scylla_pg_cdc_spark.operators.scalars  # noqa: F401
    import scylla_pg_cdc_spark.operators.reconcile  # noqa: F401
    import scylla_pg_cdc_spark.operators.cdc  # noqa: F401
    import scylla_pg_cdc_spark.operators.text  # noqa: F401
    import scylla_pg_cdc_spark.operators.vector  # noqa: F401

    return dict(REGISTRY)
