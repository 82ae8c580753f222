"""Schema-evolution compatibility checker over Spark StructTypes.

Capability port of the reference's Avro validator
(`src/utils/schema_validator.py:245-471`): BACKWARD / FORWARD / FULL /
NONE compatibility modes (:17-22, dispatch :395-427), with the rules
- a field removed, or added without a default, breaks BACKWARD
  (:283-294);
- type changes allowed only along promotion chains
  int -> long -> float -> double and string -> bytes (:461-471);
- unions ~ nullable fields (:445-458).

Like the reference, this is pure driver-side metadata logic — schemas
are small; the 100 TB data never moves. ``fingerprint`` mirrors the
canonical-JSON sha256 (`schema_validator.py:492-508`).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

from pyspark.sql.types import (
    BinaryType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
)

BACKWARD = "BACKWARD"
FORWARD = "FORWARD"
FULL = "FULL"
NONE = "NONE"

# Widening promotion chains (schema_validator.py:461-471)
_PROMOTIONS: dict[type, tuple[type, ...]] = {
    ByteType: (ShortType, IntegerType, LongType, FloatType, DoubleType),
    ShortType: (IntegerType, LongType, FloatType, DoubleType),
    IntegerType: (LongType, FloatType, DoubleType),
    LongType: (FloatType, DoubleType),
    FloatType: (DoubleType,),
    StringType: (BinaryType,),
}


class SchemaCompatibilityError(Exception):
    """Raised when a new schema version violates the configured mode
    (analog of the reference's SchemaCompatibilityError)."""


@dataclass
class CompatibilityResult:
    compatible: bool
    mode: str
    errors: list[str] = field(default_factory=list)


def _is_type_compatible(old: DataType, new: DataType) -> bool:
    """Reader with ``new`` can consume data written as ``old``."""
    if old == new:
        return True
    return type(new) in _PROMOTIONS.get(type(old), ())


def _can_read(reader: StructType, writer: StructType) -> list[str]:
    """Errors preventing ``reader`` from consuming ``writer`` data.
    A field present on only one side needs a default => here, nullable
    (union-with-null, schema_validator.py:445-458). Like the reference
    validator, a *removed* required field is also flagged
    (`schema_validator.py:283-294`: "Field removed without default
    value") — conservative relative to pure Avro reader semantics, but
    it is the contract the reference enforces."""
    errors: list[str] = []
    writer_fields = {f.name: f for f in writer.fields}
    reader_fields = {f.name: f for f in reader.fields}
    for rf in reader.fields:
        wf = writer_fields.get(rf.name)
        if wf is None:
            if not rf.nullable:
                errors.append(
                    f"field '{rf.name}' added without default (not nullable)"
                )
            continue
        if not _is_type_compatible(wf.dataType, rf.dataType):
            errors.append(
                f"field '{rf.name}': illegal type change "
                f"{wf.dataType.simpleString()} -> {rf.dataType.simpleString()}"
            )
        if wf.nullable and not rf.nullable:
            errors.append(f"field '{rf.name}': nullable -> required narrowing")
    for wf in writer.fields:
        if wf.name not in reader_fields and not wf.nullable:
            errors.append(
                f"field '{wf.name}' removed without default (not nullable)"
            )
    return errors


def check_compatibility(
    new_schema: StructType, old_schema: StructType, mode: str = BACKWARD
) -> CompatibilityResult:
    """Mode dispatch mirroring `schema_validator.py:395-427`.

    BACKWARD: new readers consume old data; FORWARD: old readers
    consume new data; FULL: both; NONE: anything goes.
    """
    if mode == NONE:
        return CompatibilityResult(True, mode)
    errors: list[str] = []
    if mode in (BACKWARD, FULL):
        errors += [f"BACKWARD: {e}" for e in _can_read(new_schema, old_schema)]
    if mode in (FORWARD, FULL):
        errors += [f"FORWARD: {e}" for e in _can_read(old_schema, new_schema)]
    if mode not in (BACKWARD, FORWARD, FULL):
        raise ValueError(f"unknown compatibility mode: {mode}")
    return CompatibilityResult(not errors, mode, errors)


def validate_or_raise(
    new_schema: StructType, old_schema: StructType, mode: str = BACKWARD
) -> None:
    res = check_compatibility(new_schema, old_schema, mode)
    if not res.compatible:
        raise SchemaCompatibilityError("; ".join(res.errors))


def fingerprint(schema: StructType) -> str:
    """sha256 of the canonical JSON form (`schema_validator.py:492-508`)."""
    canonical = json.dumps(schema.jsonValue(), sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(canonical.encode("utf-8")).hexdigest()


@dataclass
class SchemaRegistry:
    """Minimal in-process registry: subject -> ordered versions, with a
    per-subject compatibility mode (registry behavior,
    `data-model.md:136-167`)."""

    mode: str = BACKWARD
    _subjects: dict[str, list[StructType]] = field(default_factory=dict)

    def register(self, subject: str, schema: StructType) -> int:
        versions = self._subjects.setdefault(subject, [])
        if versions:
            validate_or_raise(schema, versions[-1], self.mode)
        if versions and fingerprint(versions[-1]) == fingerprint(schema):
            return len(versions)
        versions.append(schema)
        return len(versions)

    def latest(self, subject: str) -> StructType | None:
        versions = self._subjects.get(subject)
        return versions[-1] if versions else None
