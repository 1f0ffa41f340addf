"""S1: Kafka sources for the three CDC topics.

Reference: ``builder.stream(topic, Consumed.with(String, SpecificAvro))``
(TokenBalance.java:92-94/100-102/108-110; serde wiring
util/Schemas.java:88-136).  Spark equivalent: ``readStream.format
("kafka")`` + payload decode into the declared StructType.

Wire formats:
- ``json``: plain ``from_json`` (the fixture/replay format);
- ``avro``: Confluent wire format = 1 magic byte + 4-byte schema id +
  Avro body.  Stock ``from_avro`` does not strip the header (SURVEY
  (S)7.3): slice 6.. before decoding.  ``from_avro`` needs the writer
  schema JSON -- supply via ``avro_schema_json`` (this engine declares
  schemas in code; a live deployment would fetch them from its
  registry once at startup, not per-record).

No Kafka broker exists in the test container; these functions are
exercised by construction tests (plan building, no execution) and by
file-stream equivalents in files.py, which share every downstream
operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from nearscan_kafka_streams_spark.schemas import with_event_time


def read_topic_stream(
    spark: SparkSession,
    topic: str,
    schema: StructType,
    event_time_source: str,
    bootstrap: str = "localhost:9092",
    starting_offsets: str = "earliest",
    wire_format: str = "json",
    avro_schema_json: str | None = None,
    kafka_options: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming DataFrame of decoded topic records + ``event_time``.

    Key (the reference's receipt_id message key) is surfaced as
    ``kafka_key``; downstream operators join on the payload's own
    receipt_id column, so the key is informational (S1 parity).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in (kafka_options or {}).items():
        reader = reader.option(k, v)
    raw = reader.load()

    if wire_format == "json":
        decoded = raw.select(
            F.col("key").cast("string").alias("kafka_key"),
            F.from_json(F.col("value").cast("string"), schema).alias("v"),
        )
    elif wire_format == "avro":
        if avro_schema_json is None:
            raise ValueError("avro wire format requires avro_schema_json")
        from pyspark.sql.avro.functions import from_avro

        # Confluent wire format: strip magic byte + 4-byte schema id
        body = F.expr("substring(value, 6, length(value) - 5)")
        decoded = raw.select(
            F.col("key").cast("string").alias("kafka_key"),
            from_avro(body, avro_schema_json).alias("v"),
        )
    else:
        raise ValueError(f"unknown wire format: {wire_format}")

    flat = decoded.select("kafka_key", "v.*")
    return with_event_time(flat, event_time_source)
