"""S3/S4: Kafka sinks.

Reference: ``.to(topic, Produced.with(String, SpecificAvro))`` --
append stream for ``token_transfer`` (TokenBalance.java:274-276, via a
1-partition repartition topic for global order, :275) and the
update-per-key changelog for ``token_balance`` (:331-333; downstream
UPSERTed into Postgres on pk ``account``, README.md:273-297).

Spark mapping: ``writeStream.format("kafka")`` with
- append mode + ``repartition(1)`` for the transfer stream (T3 parity:
  global ordering; at scale you would drop this, exactly like the
  reference would need >1 partition to scale -- it is a semantic
  choice, not an engine limit);
- update mode for the balance changelog (consumers treat it as keyed
  upserts -- same contract as the reference's sink connector).

Value serialization (``topic_payload``) supports JSON and
Confluent-framed Avro (serde/avro.py -- the reference's actual wire
format) and is factored out of the broker write so the serialization
leg is executable/testable without a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from nearscan_kafka_streams_spark.serde.avro import (
    avro_schema_from_struct,
    encode_confluent_udf,
)


def topic_payload(
    df: DataFrame,
    key_col: str,
    wire_format: str = "json",
    avro_schema: dict | str | None = None,
    schema_id: int = 1,
) -> DataFrame:
    """Rows -> Kafka-shaped (key string, value binary/string) records.

    ``avro``: Confluent-framed Avro via the pure-Python codec; the
    value schema defaults to one generated from the DataFrame schema
    (avro_schema_from_struct) when not supplied.
    """
    cols = [c for c in df.columns]
    if wire_format == "json":
        value = F.to_json(F.struct(*cols)).alias("value")
    elif wire_format == "avro":
        schema = avro_schema or avro_schema_from_struct(df.schema)
        enc = encode_confluent_udf(schema, schema_id=schema_id)
        value = enc(F.struct(*cols)).alias("value")
    else:
        raise ValueError(f"unknown wire format: {wire_format}")
    return df.select(F.col(key_col).cast("string").alias("key"), value)


def write_topic_stream(
    df: DataFrame,
    topic: str,
    key_col: str,
    checkpoint: str,
    bootstrap: str = "localhost:9092",
    output_mode: str = "append",
    single_partition: bool = False,
    trigger_interval: str | None = None,
    wire_format: str = "json",
    avro_schema: dict | str | None = None,
    schema_id: int = 1,
    kafka_options: dict[str, str] | None = None,
) -> StreamingQuery:
    """Serialize rows as (key, value) and write to a Kafka topic."""
    out = df
    if single_partition:
        # T3: global ordering of transfers (TokenBalance.java:275)
        out = out.repartition(1)
    payload = topic_payload(out, key_col, wire_format, avro_schema, schema_id)
    writer = (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    for k, v in (kafka_options or {}).items():
        writer = writer.option(k, v)
    if trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
