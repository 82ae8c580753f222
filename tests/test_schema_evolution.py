"""Compatibility-matrix tests — ports the reference's
test_schema_validator.py coverage (promotions :346-377, add/remove
field rules :283-294, mode dispatch :395-427)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from scylla_pg_cdc_spark.functions.schema_evolution import (
    BACKWARD,
    FORWARD,
    FULL,
    NONE,
    SchemaCompatibilityError,
    SchemaRegistry,
    check_compatibility,
    fingerprint,
    validate_or_raise,
)


def s(*fields):
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


BASE = s(("id", LongType(), False), ("name", StringType(), True))


def test_identical_schemas_compatible_all_modes():
    for mode in (BACKWARD, FORWARD, FULL, NONE):
        assert check_compatibility(BASE, BASE, mode).compatible


def test_add_nullable_field_is_backward_compatible():
    new = s(("id", LongType(), False), ("name", StringType(), True),
            ("extra", StringType(), True))
    assert check_compatibility(new, BASE, BACKWARD).compatible


def test_add_required_field_breaks_backward():
    new = s(("id", LongType(), False), ("name", StringType(), True),
            ("extra", StringType(), False))
    res = check_compatibility(new, BASE, BACKWARD)
    assert not res.compatible and "without default" in res.errors[0]


def test_remove_nullable_field_compatible_both_ways():
    # nullable ~ union-with-null => default null, so removal is safe in
    # both directions (Avro semantics)
    new = s(("id", LongType(), False))
    assert check_compatibility(new, BASE, BACKWARD).compatible
    assert check_compatibility(new, BASE, FORWARD).compatible


def test_remove_required_field_breaks_both_directions():
    # the reference flags removed required fields in either direction
    # (schema_validator.py:283-294 "removed without default")
    new = s(("name", StringType(), True))
    assert not check_compatibility(new, BASE, BACKWARD).compatible
    assert not check_compatibility(new, BASE, FORWARD).compatible


def test_type_promotion_int_to_long_to_double():
    old = s(("v", IntegerType(), True))
    for wider in (LongType(), DoubleType()):
        new = s(("v", wider, True))
        assert check_compatibility(new, old, BACKWARD).compatible


def test_type_narrowing_breaks():
    old = s(("v", DoubleType(), True))
    new = s(("v", IntegerType(), True))
    res = check_compatibility(new, old, BACKWARD)
    assert not res.compatible and "illegal type change" in res.errors[0]


def test_full_mode_requires_both_directions():
    # required add breaks BACKWARD; required removal breaks FORWARD —
    # either alone must fail FULL
    added = s(("id", LongType(), False), ("name", StringType(), True),
              ("extra", StringType(), False))
    assert not check_compatibility(added, BASE, FULL).compatible
    removed = s(("name", StringType(), True))
    assert not check_compatibility(removed, BASE, FULL).compatible


def test_none_mode_accepts_anything():
    new = s(("totally", StringType(), True))
    assert check_compatibility(new, BASE, NONE).compatible


def test_validate_or_raise():
    new = s(("v", IntegerType(), True))
    old = s(("v", DoubleType(), True))
    with pytest.raises(SchemaCompatibilityError):
        validate_or_raise(new, old, BACKWARD)


def test_fingerprint_stable_and_distinct():
    assert fingerprint(BASE) == fingerprint(BASE)
    assert fingerprint(BASE) != fingerprint(s(("id", LongType(), False)))


def test_registry_versions_and_rejection():
    reg = SchemaRegistry(mode=BACKWARD)
    assert reg.register("orders-value", BASE) == 1
    evolved = s(("id", LongType(), False), ("name", StringType(), True),
                ("note", StringType(), True))
    assert reg.register("orders-value", evolved) == 2
    bad = s(("id", StringType(), False))
    with pytest.raises(SchemaCompatibilityError):
        reg.register("orders-value", bad)
    assert reg.latest("orders-value") == evolved
