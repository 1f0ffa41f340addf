"""Sinks: Kafka writers (S3/S4) + upsert sink (the reference's
Postgres-connector behavior, README.md:273-297)."""

from nearscan_kafka_streams_spark.sinks.kafka import write_topic_stream
from nearscan_kafka_streams_spark.sinks.upsert import foreach_batch_upsert

__all__ = ["foreach_batch_upsert", "write_topic_stream"]
