from nearscan_kafka_streams_spark.plans.explain import (
    formatted_plan,
    has_broadcast_hash_join,
    pushed_filters,
    read_schema_columns,
)
from nearscan_kafka_streams_spark.plans.observe import observe_counts

__all__ = [
    "formatted_plan",
    "has_broadcast_hash_join",
    "observe_counts",
    "pushed_filters",
    "read_schema_columns",
]
