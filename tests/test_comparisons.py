"""Typed tolerant-equality matrix — ports the reference comparer's
edge cases (`tests/unit/test_comparer.py`: tz handling, Decimal
precision, UUID-as-string, order-sensitive lists, nested structures,
float tolerance, null-vs-empty-string)."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    DoubleType,
    MapType,
    StringType,
    TimestampType,
)

from scylla_pg_cdc_spark.functions.comparisons import values_equal


def _eval(spark, a, b, dtype, **kw):
    df = spark.createDataFrame([(1,)], "i int").select(
        values_equal(F.lit(a).cast(dtype), F.lit(b).cast(dtype), dtype, **kw)
        .alias("eq")
    )
    return df.collect()[0]["eq"]


def test_float_within_and_beyond_tolerance(spark):
    assert _eval(spark, 1.0, 1.00005, DoubleType()) is True
    assert _eval(spark, 1.0, 1.001, DoubleType()) is False
    assert _eval(spark, 1.0, 1.001, DoubleType(), float_tol=0.01) is True


def test_float_null_semantics(spark):
    assert _eval(spark, None, None, DoubleType()) is True   # null == null
    assert _eval(spark, 1.0, None, DoubleType()) is False   # null vs value


def test_decimal_trailing_zero_insensitive(spark):
    # fixed-scale DecimalType normalizes 1.5 and 1.50 to the same value
    assert _eval(spark, Decimal("1.50"), Decimal("1.5"), DecimalType(10, 2)) is True
    assert _eval(spark, Decimal("1.50"), Decimal("1.51"), DecimalType(10, 2)) is False


def test_string_null_vs_empty_not_equal(spark):
    assert _eval(spark, None, "", StringType()) is False
    assert _eval(spark, "", "", StringType()) is True
    assert _eval(spark, None, None, StringType()) is True


def test_uuid_canonical_string_compare(spark):
    u = "550e8400-e29b-41d4-a716-446655440000"
    assert _eval(spark, u, u, StringType()) is True
    assert _eval(spark, u, u.upper(), StringType()) is False  # canonical only


def test_timestamp_instant_compare(spark):
    t1 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    t2 = datetime.datetime(2024, 1, 1, 12, 0, 0, 1)
    assert _eval(spark, t1, t1, TimestampType()) is True
    assert _eval(spark, t1, t2, TimestampType()) is False


def test_array_order_sensitive(spark):
    at = ArrayType(StringType())
    assert _eval(spark, ["a", "b"], ["a", "b"], at) is True
    assert _eval(spark, ["a", "b"], ["b", "a"], at) is False  # comparer.py:277-280
    assert _eval(spark, ["a"], ["a", "b"], at) is False       # length mismatch


def test_map_key_and_value_equality(spark):
    mt = MapType(StringType(), StringType())

    def eval_maps(a_expr, b_expr):
        df = spark.createDataFrame([(1,)], "i int").select(
            values_equal(F.expr(a_expr), F.expr(b_expr), mt).alias("eq")
        )
        return df.collect()[0]["eq"]

    assert eval_maps("map('k','v')", "map('k','v')") is True
    assert eval_maps("map('k','v')", "map('k','w')") is False
    assert eval_maps("map('k','v')", "map('k','v','j','x')") is False
    # insertion order must not matter (key-set semantics)
    assert eval_maps("map('a','1','b','2')", "map('b','2','a','1')") is True
