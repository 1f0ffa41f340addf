"""Sinks: Kafka writers (S3/S4) + upsert sink (the reference's
Postgres-connector behavior, README.md:273-297) + range-clustered
parquet layout writer."""

from nearscan_kafka_streams_spark.sinks.kafka import (
    topic_payload,
    write_topic_stream,
)
from nearscan_kafka_streams_spark.sinks.layout import (
    write_hive_partitioned,
    write_range_clustered,
    write_with_bloom_filters,
    write_zorder_clustered,
)
from nearscan_kafka_streams_spark.sinks.manifest import (
    validate_manifest,
    write_with_manifest,
)
from nearscan_kafka_streams_spark.sinks.upsert import (
    duckdb_merge_fn,
    foreach_batch_additive,
    foreach_batch_upsert,
    list_store_versions,
    read_store,
    read_store_as_of,
    store_changelog,
)

__all__ = [
    "duckdb_merge_fn",
    "foreach_batch_additive",
    "foreach_batch_upsert",
    "list_store_versions",
    "read_store",
    "read_store_as_of",
    "store_changelog",
    "topic_payload",
    "validate_manifest",
    "write_with_manifest",
    "write_hive_partitioned",
    "write_range_clustered",
    "write_with_bloom_filters",
    "write_zorder_clustered",
    "write_topic_stream",
]
