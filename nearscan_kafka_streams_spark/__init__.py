"""PySpark-native analytics engine with the capability surface of
octopus-network/nearscan-kafka-streams.

The reference is a single Kafka Streams topology
(/root/reference/src/main/java/network/octopus/nearin/TokenBalance.java)
that consumes three Debezium-CDC Avro topics mirroring NEAR indexer
tables, deduplicates, joins receipt<->execution-outcome<->action within
+/-2s, decodes NEP-141 function-call args from JSON, emits a
``token_transfer`` event stream and maintains a per-account running
``token_balance`` table.

This package re-expresses that surface Spark-first:

- every transform is a pure ``DataFrame -> DataFrame`` function
  (batch and Structured Streaming share them);
- the business logic (transfer extraction) is pure Catalyst column
  expressions -- no Python row-at-a-time UDFs in the hot path;
- streaming is a thin shell (watermarks + ``dropDuplicatesWithinWatermark``
  + stream-stream interval joins + update-mode aggregation).

Beyond reference parity, ``functions/`` and ``queries.py`` add the
large-scale training-data-pipeline operators (dedup family, similarity
search, text analysis, multimodal column plumbing) designed for
100 TB / multi-executor scale.
"""

__version__ = "0.1.0"
