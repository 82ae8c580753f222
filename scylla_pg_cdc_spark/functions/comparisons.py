"""Tolerant typed-equality as pure column expressions.

Port of the reference comparer's normalization matrix
(`src/reconciliation/comparer.py:167-292`) re-expressed so Catalyst can
codegen it — the reference normalizes row-at-a-time in Python (UUID ->
canonical string :205-206, Decimal.normalize :209-211, naive-UTC tz
coercion :214-218, float |a-b| < 1e-4 :266-267, null==null true
:247-250, order-sensitive lists :277-280, recursive maps :283-288).

Here every rule is a ``Column`` predicate generated from the schema at
plan-build time. No UDFs, no row loops: at 100 TB the whole comparison
runs inside whole-stage codegen, and the diff of two datasets is ONE
full-outer shuffle join plus a generated projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    MapType,
    StructType,
    TimestampType,
)

DEFAULT_FLOAT_TOL = 1e-4  # comparer.py:27


def values_equal(
    a: Column, b: Column, dtype: DataType, float_tol: float = DEFAULT_FLOAT_TOL
) -> Column:
    """Null-safe tolerant equality for one column of the given type.

    - null == null  -> true; null vs value -> false (comparer.py:247-250)
    - float/double  -> |a-b| < tol (comparer.py:266-267)
    - decimal       -> exact compare after normalization-by-type
      (trailing-zero-insensitive because DecimalType is fixed-scale;
      comparer.py:261-263)
    - timestamp     -> instant compare in session tz = UTC
      (comparer.py:270-274)
    - array         -> ordered element equality (comparer.py:277-280)
    - map/struct    -> recursive equality (comparer.py:283-288); Spark's
      <=> on complex types is already recursive + null-safe
    """
    if isinstance(dtype, (DoubleType, FloatType)):
        both_null = a.isNull() & b.isNull()
        both_set = a.isNotNull() & b.isNotNull()
        return both_null | (both_set & (F.abs(a - b) < F.lit(float_tol)))
    if isinstance(dtype, MapType):
        # Spark forbids direct map equality; canonicalize to sorted
        # entry arrays (key-set + value equality, comparer.py:283-288)
        return F.array_sort(F.map_entries(a)).eqNullSafe(
            F.array_sort(F.map_entries(b))
        )
    if isinstance(dtype, (DecimalType, TimestampType, ArrayType, StructType)):
        return a.eqNullSafe(b)
    return a.eqNullSafe(b)


def row_equal(
    left_prefix: str,
    right_prefix: str,
    schema: StructType,
    fields: list[str],
    float_tol: float = DEFAULT_FLOAT_TOL,
) -> Column:
    """AND-fold of per-field tolerant equality over ``fields`` —
    the expression form of RowComparer.compare_rows
    (`comparer.py:30-94`)."""
    by_name = {f.name: f.dataType for f in schema.fields}
    pred = F.lit(True)
    for name in fields:
        pred = pred & values_equal(
            F.col(f"{left_prefix}.{name}"),
            F.col(f"{right_prefix}.{name}"),
            by_name[name],
            float_tol,
        )
    return pred


def differing_fields(
    left_prefix: str,
    right_prefix: str,
    schema: StructType,
    fields: list[str],
    float_tol: float = DEFAULT_FLOAT_TOL,
) -> Column:
    """Array of field names whose values differ — the expression form
    of the field-level diff detail (`differ.py:129-174`,
    `comparer.py:96-147`). Sorted for determinism."""
    by_name = {f.name: f.dataType for f in schema.fields}
    names = [
        F.when(
            ~values_equal(
                F.col(f"{left_prefix}.{name}"),
                F.col(f"{right_prefix}.{name}"),
                by_name[name],
                float_tol,
            ),
            F.lit(name),
        )
        for name in sorted(fields)
    ]
    return F.array_compact(F.array(*names))
