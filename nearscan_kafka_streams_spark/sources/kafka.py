"""S1: Kafka sources for the three CDC topics.

Reference: ``builder.stream(topic, Consumed.with(String, SpecificAvro))``
(TokenBalance.java:92-94/100-102/108-110; serde wiring
util/Schemas.java:88-136).  Spark equivalent: ``readStream.format
("kafka")`` + payload decode into the declared StructType.

Wire formats:
- ``json``: plain ``from_json`` (the fixture/replay format);
- ``avro``: Confluent wire format = 1 magic byte + 4-byte schema id +
  Avro body.  The header strip (slice 6..; stock ``from_avro`` does not
  do it, SURVEY (S)7.3) happens JVM-side; the body decodes through the
  built-in pure-Python codec (serde/avro.py) by default -- executable
  with no connector jars -- or through ``spark-avro``'s ``from_avro``
  when ``use_spark_avro_jar=True`` on clusters that ship it.

Schemas come from code (schemas.py) or a registry fetched ONCE at
plan-build time (serde/registry.py; the reference fetches at startup,
util/Schemas.java:113-136) -- never per record.

No Kafka broker exists in the test container; the broker leg is
exercised by construction tests, while the decode path itself runs for
real against framed bytes (tests/test_avro_wire.py) and file-stream
equivalents in files.py share every downstream operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from nearscan_kafka_streams_spark.schemas import with_event_time
from nearscan_kafka_streams_spark.serde.avro import decode_confluent_udf


def decode_topic_values(
    raw: DataFrame,
    schema: StructType,
    wire_format: str = "json",
    avro_schema_json: str | None = None,
    use_spark_avro_jar: bool = False,
) -> DataFrame:
    """(key, value) Kafka records -> flat decoded columns.

    Shared by the streaming source and batch replays of captured topic
    dumps; ``raw`` needs binary ``value`` and (optionally) ``key``.
    """
    key = (
        F.col("key").cast("string")
        if "key" in raw.columns
        else F.lit(None).cast("string")
    ).alias("kafka_key")

    if wire_format == "json":
        decoded = raw.select(
            key, F.from_json(F.col("value").cast("string"), schema).alias("v")
        )
    elif wire_format == "avro":
        if avro_schema_json is None:
            raise ValueError("avro wire format requires avro_schema_json")
        # Confluent wire format: strip magic byte + 4-byte schema id
        # JVM-side so the slice shows up in the plan
        body = F.expr("substring(value, 6, length(value) - 5)")
        if use_spark_avro_jar:
            from pyspark.sql.avro.functions import from_avro

            decoded = raw.select(key, from_avro(body, avro_schema_json).alias("v"))
        else:
            dec = decode_confluent_udf(avro_schema_json, schema, framed=False)
            decoded = raw.select(key, dec(body).alias("v"))
    else:
        raise ValueError(f"unknown wire format: {wire_format}")

    return decoded.select("kafka_key", "v.*")


def read_topic_stream(
    spark: SparkSession,
    topic: str,
    schema: StructType,
    event_time_source: str,
    bootstrap: str = "localhost:9092",
    starting_offsets: str = "earliest",
    wire_format: str = "json",
    avro_schema_json: str | None = None,
    use_spark_avro_jar: bool = False,
    registry=None,
    subject: str | None = None,
    envelope: str = "flat",
    kafka_options: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming DataFrame of decoded topic records + ``event_time``.

    Key (the reference's receipt_id message key) is surfaced as
    ``kafka_key``; downstream operators join on the payload's own
    receipt_id column, so the key is informational (S1 parity).

    Pass ``registry`` (serde/registry.py) to resolve the value schema
    from ``subject`` (default ``{topic}-value``) at startup instead of
    supplying ``avro_schema_json`` directly.

    ``envelope="debezium"`` unwraps raw Debezium CDC envelopes
    in-engine (S5; sources/debezium.py) for deployments without the
    ExtractNewRecordState SMT the reference assumes upstream --
    JSON envelopes only (Connect's JSON converter).
    """
    if registry is not None and avro_schema_json is None:
        _, avro_schema_json = registry.latest(subject or f"{topic}-value")

    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in (kafka_options or {}).items():
        reader = reader.option(k, v)
    raw = reader.load()

    if envelope == "debezium":
        if wire_format != "json":
            raise ValueError("debezium envelope decoding supports json values")
        from nearscan_kafka_streams_spark.sources.debezium import (
            decode_debezium_values,
        )

        flat = decode_debezium_values(raw, schema)
    elif envelope == "flat":
        flat = decode_topic_values(
            raw, schema, wire_format, avro_schema_json, use_spark_avro_jar
        )
    else:
        raise ValueError(f"unknown envelope: {envelope}")
    return with_event_time(flat, event_time_source)
