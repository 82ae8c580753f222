"""Avro binary serde (VERDICT r1 next-round #6): stdlib codec checked
against HAND-COMPUTED spec bytes (zigzag varints, union indexes, map
blocks), envelope round trip through the DataFrame faces, and a JVM
cross-check that activates when the spark-avro package is loadable
(skips with a clear marker otherwise)."""

from __future__ import annotations

import pytest

from scylla_pg_cdc_spark.sources.avro_codec import (
    CHANGE_EVENT_AVRO,
    avro_decode,
    avro_encode,
    avro_sql_available,
    encode_envelope_avro,
    parse_envelope_avro,
)
from scylla_pg_cdc_spark.sources.envelope import ENVELOPE_SCHEMA
from pyspark.sql.types import StructField, StructType

SAMPLE = {
    "correlation_id": "ab",
    "operation": "INSERT",
    "table_name": "t",
    "primary_key": {"id": "7"},
    "before": None,
    "after": None,
    "commit_timestamp": 1000,
    "captured_at": None,
    "schema_version": 1,
}

# Every byte derived by hand from the Avro 1.11 binary-encoding spec:
# unions prefix a zigzag branch index; strings are length-prefixed
# UTF-8; maps are count-prefixed blocks with a 0 terminator;
# zigzag(1000) = 2000 -> varint 0xD0 0x0F.
GOLDEN = bytes(
    [0x02, 0x04] + list(b"ab")            # correlation_id: union 1, "ab"
    + [0x0C] + list(b"INSERT")            # operation: "INSERT"
    + [0x02] + list(b"t")                 # table_name: "t"
    + [0x02, 0x02, 0x04] + list(b"id")    # pk: union 1, 1 entry, key "id"
    + [0x02, 0x02] + list(b"7") + [0x00]  #   value: union 1, "7"; end map
    + [0x00]                              # before: union 0 (null)
    + [0x00]                              # after: union 0 (null)
    + [0x02, 0xD0, 0x0F]                  # commit_timestamp: union 1, 1000
    + [0x00]                              # captured_at: null
    + [0x02, 0x02]                        # schema_version: union 1, 1
)


def test_encode_matches_hand_computed_spec_bytes():
    assert avro_encode(CHANGE_EVENT_AVRO, SAMPLE) == GOLDEN


def test_decode_golden_bytes():
    assert avro_decode(CHANGE_EVENT_AVRO, GOLDEN) == SAMPLE


def test_roundtrip_edge_values():
    for rec in (
        {**SAMPLE, "commit_timestamp": -1},
        {**SAMPLE, "commit_timestamp": 2**62},
        {**SAMPLE, "correlation_id": None, "primary_key": None},
        {**SAMPLE, "after": {"k": None, "x": "Ünïcødé ✓"}},
        {**SAMPLE, "before": {}},
    ):
        assert avro_decode(CHANGE_EVENT_AVRO, avro_encode(CHANGE_EVENT_AVRO, rec)) == rec


def _envelope_df(spark):
    rows = [
        (
            (
                "c-1", "INSERT", "users", {"id": "1"}, None,
                {"email": "a@b", "n": "3"}, 1_700_000_000_000_000,
                1_700_000_000_123, 1,
            ),
        ),
        (
            (
                None, "DELETE", "orders", {"id": "9"},
                {"total": "5.0"}, None, 1_700_000_111_000_000, None, 2,
            ),
        ),
    ]
    schema = StructType([StructField("event", ENVELOPE_SCHEMA)])
    return spark.createDataFrame(rows, schema)


def test_envelope_dataframe_roundtrip(spark):
    df = _envelope_df(spark)
    encoded = encode_envelope_avro(df)
    assert dict(encoded.dtypes)["value"] == "binary"
    decoded = parse_envelope_avro(encoded.select("value"))
    got = sorted(
        (r["event"].asDict(recursive=True) for r in decoded.collect()),
        key=lambda d: d["operation"],
    )
    want = sorted(
        (r["event"].asDict(recursive=True) for r in df.collect()),
        key=lambda d: d["operation"],
    )
    assert got == want


def test_python_bytes_decode_with_jvm_when_available(spark):
    """Wire-compatibility: stdlib-encoded bytes must decode via JVM
    from_avro. Runs only when the spark-avro package is loaded."""
    if not avro_sql_available(spark):
        pytest.skip("spark-avro package not loaded in this environment")
    from pyspark.sql.avro.functions import from_avro
    from pyspark.sql import functions as F
    from scylla_pg_cdc_spark.sources.avro_codec import CHANGE_EVENT_AVRO_JSON

    blob = avro_encode(CHANGE_EVENT_AVRO, SAMPLE)
    df = spark.createDataFrame([(bytearray(blob),)], "value binary")
    row = df.select(
        from_avro(F.col("value"), CHANGE_EVENT_AVRO_JSON).alias("event")
    ).head()
    assert row["event"].asDict(recursive=True) == SAMPLE


# ---------------------------------------------------------------------
# Property-based round trip (hypothesis)
# ---------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_opt_str = st.none() | st.text(max_size=40)
_opt_map = st.none() | st.dictionaries(
    st.text(min_size=1, max_size=10), st.none() | st.text(max_size=20),
    max_size=5,
)
_envelope = st.fixed_dictionaries(
    {
        "correlation_id": _opt_str,
        "operation": st.sampled_from(["INSERT", "UPDATE", "DELETE", "TRUNCATE"]),
        "table_name": st.text(min_size=1, max_size=30),
        "primary_key": _opt_map,
        "before": _opt_map,
        "after": _opt_map,
        "commit_timestamp": st.none() | st.integers(-(2**63), 2**63 - 1),
        "captured_at": st.none() | st.integers(-(2**63), 2**63 - 1),
        "schema_version": st.none() | st.integers(-(2**31), 2**31 - 1),
    }
)


@settings(max_examples=200, deadline=None)
@given(_envelope)
def test_codec_roundtrip_property(rec):
    """Any well-typed envelope — full int64/int32 range, unicode keys
    and values, NULLs at every optional position — survives
    encode->decode bit-exactly."""
    assert avro_decode(CHANGE_EVENT_AVRO, avro_encode(CHANGE_EVENT_AVRO, rec)) == rec
