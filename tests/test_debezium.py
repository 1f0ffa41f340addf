"""S5: Debezium envelope unwrap + full streaming topology over the
Avro wire format (the two source shapes a live deployment feeds us)."""

from __future__ import annotations

import json
import shutil

from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.schemas import (
    RECEIPTS_SCHEMA,
    TOPIC_SCHEMAS,
    avro_value_schema,
    with_event_time,
)
from nearscan_kafka_streams_spark.sources.debezium import decode_debezium_values


def _receipt_image(rid: str) -> dict:
    return {
        "receipt_id": rid,
        "included_in_block_hash": "bh",
        "included_in_chunk_hash": "ch",
        "index_in_chunk": 1,
        "included_in_block_timestamp": "1616161616161616161",
        "predecessor_account_id": "a.near",
        "receiver_account_id": "t.near",
        "receipt_kind": "ACTION",
        "originated_from_transaction_hash": "tx",
    }


def test_debezium_envelope_unwrap(spark):
    """Schema-wrapped create, bare update, and delete envelopes all
    flatten to the post-SMT shape the topology consumes; deletes carry
    __deleted='true' (delete.handling.mode=rewrite)."""
    rows = [
        ("r1", json.dumps({"payload": {"after": _receipt_image("r1"),
                                       "before": None, "op": "c"}})),
        ("r2", json.dumps({"after": _receipt_image("r2"),
                           "before": None, "op": "u"})),  # schemas.enable=false
        ("r3", json.dumps({"payload": {"before": _receipt_image("r3"),
                                       "after": None, "op": "d"}})),
    ]
    raw = spark.createDataFrame(rows, "key string, value string")
    out = decode_debezium_values(raw, RECEIPTS_SCHEMA)
    got = {r["receipt_id"]: r for r in out.collect()}
    assert set(got) == {"r1", "r2", "r3"}
    assert got["r1"]["__deleted"] is None
    assert got["r2"]["__deleted"] is None
    assert got["r3"]["__deleted"] == "true"
    assert got["r3"]["predecessor_account_id"] == "a.near"  # before-image
    from decimal import Decimal

    assert got["r1"]["included_in_block_timestamp"] == Decimal(
        "1616161616161616161"
    )
    # decoded rows feed the event-time derivation unchanged
    et = with_event_time(out, "included_in_block_timestamp")
    assert et.select("event_time").first()[0].year == 2021


def test_streaming_topology_over_avro_wire(spark, tmp_path):
    """End-to-end S1-parity drive: fixtures serialized to
    Confluent-framed Avro (the reference's actual wire format), read
    back as a byte stream, decoded by the pure-Python codec inside a
    REAL streaming topology (dedup -> interval joins -> flat-map),
    producing the same transfers as the JSON replay."""
    from nearscan_kafka_streams_spark.sinks.kafka import topic_payload
    from nearscan_kafka_streams_spark.sources.kafka import decode_topic_values
    from nearscan_kafka_streams_spark.streaming.pipeline import (
        build_streaming_transfers,
    )
    from tests.fixtures_near import to_dataframes

    r, o, a, expected = to_dataframes(spark)
    topics = {
        "receipts": (r, "receipts"),
        "outcomes": (o, "execution_outcomes"),
        "actions": (a, "action_receipt_actions"),
    }
    wires = {}
    for name, (df, topic) in topics.items():
        path = str(tmp_path / f"wire_{name}")
        topic_payload(
            df, "receipt_id", "avro", avro_value_schema(topic)
        ).write.parquet(path)
        wires[name] = path

    def read_wire(name: str, topic: str):
        schema, et_src = TOPIC_SCHEMAS[topic]
        raw = (
            spark.readStream.schema("key string, value binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(wires[name])
        )
        flat = decode_topic_values(
            raw, schema, "avro",
            avro_schema_json=json.dumps(avro_value_schema(topic)),
        )
        return with_event_time(flat, et_src)  # build_* renames to *_et

    transfers = build_streaming_transfers(
        read_wire("receipts", "receipts"),
        read_wire("outcomes", "execution_outcomes"),
        read_wire("actions", "action_receipt_actions"),
    )
    out_dir = tmp_path / "out"
    shutil.rmtree(out_dir, ignore_errors=True)
    q = (
        transfers.writeStream.format("parquet")
        .option("path", str(out_dir / "transfers"))
        .option("checkpointLocation", str(out_dir / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)
    got = spark.read.parquet(str(out_dir / "transfers"))
    assert got.count() == expected["transfer_rows"]
    accounts = {
        x["affected_account"]
        for x in got.select("affected_account").distinct().collect()
    }
    assert "alice.near" in accounts and "bob.near" in accounts
