"""Property-based fuzz of the pure-Python Avro codec: encode→decode is
the identity for arbitrary records over the supported type lattice
(string / int / long / boolean / double / bytes / decimal logical /
null-unions / nested records / arrays / maps).  The spec-vector tests
pin known byte sequences; this pins TOTALITY -- no value in the
domain corrupts or round-trip-drifts."""

from __future__ import annotations

import decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nearscan_kafka_streams_spark.serde.avro import (
    AvroCodec,
    confluent_frame,
    confluent_unframe,
)

SETTINGS = settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

FUZZ_SCHEMA = {
    "type": "record",
    "name": "Fuzz",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "b", "type": "boolean"},
        {"name": "d", "type": "double"},
        {"name": "raw", "type": "bytes"},
        {"name": "opt", "type": ["null", "string"], "default": None},
        {
            "name": "amount",
            "type": {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": 45,
                "scale": 0,
            },
        },
        {"name": "tags", "type": {"type": "array", "items": "long"}},
        {"name": "attrs", "type": {"type": "map", "values": "string"}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "Inner",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
    ],
}

record = st.fixed_dictionaries(
    {
        "s": st.text(max_size=80),  # arbitrary unicode
        "i": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "l": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "b": st.booleans(),
        "d": st.floats(allow_nan=False),  # NaN breaks == comparison only
        "raw": st.binary(max_size=64),
        "opt": st.none() | st.text(max_size=20),
        "amount": st.integers(
            min_value=-(10**44), max_value=10**44
        ).map(lambda v: decimal.Decimal(v)),
        "tags": st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            max_size=8,
        ),
        "attrs": st.dictionaries(
            st.text(max_size=10), st.text(max_size=10), max_size=5
        ),
        "nested": st.fixed_dictionaries(
            {"x": st.integers(min_value=-(2**31), max_value=2**31 - 1)}
        ),
    }
)


@SETTINGS
@given(record)
def test_codec_round_trip_identity(rec):
    codec = AvroCodec(FUZZ_SCHEMA)
    assert codec.decode(codec.encode(rec)) == rec


@SETTINGS
@given(record, st.integers(min_value=0, max_value=2**31 - 1))
def test_confluent_frame_round_trip(rec, schema_id):
    codec = AvroCodec(FUZZ_SCHEMA)
    framed = confluent_frame(schema_id, codec.encode(rec))
    sid, body = confluent_unframe(framed)
    assert sid == schema_id
    assert codec.decode(body) == rec
