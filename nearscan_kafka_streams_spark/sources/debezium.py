"""S5: Debezium CDC envelope decoding.

The reference consumes topics already flattened by Debezium's
``ExtractNewRecordState`` SMT with ``delete.handling.mode=rewrite``
(which is why every topic schema carries a ``__deleted`` string field
-- see the connector config sketch in README.md and the ``__deleted``
unions in the .avsc files).  That SMT runs OUTSIDE the reference, in
Kafka Connect; deployments without it publish the raw envelope:

    {"payload": {"before": {...}|null, "after": {...}|null,
                 "op": "c"|"u"|"d"|"r", "ts_ms": ...}}

(or the same object unwrapped when the JSON converter runs with
``schemas.enable=false``).  This module performs the unwrap in-engine,
so either topic shape feeds the same downstream operators:

- op c/u/r -> the ``after`` image, ``__deleted`` null
- op d     -> the ``before`` image, ``__deleted`` = "true" (rewrite
  mode's tombstone marker, which the dedup/filter stages already
  understand)

Pure Catalyst: one ``from_json`` + CASE over struct fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _envelope_schema(row_schema: StructType) -> StructType:
    """Envelope StructType for a topic row schema (sans __deleted --
    Debezium images carry the table columns only)."""
    image = StructType(
        [f for f in row_schema.fields if f.name != "__deleted"]
    )
    payload = StructType(
        [
            StructField("before", image, True),
            StructField("after", image, True),
            StructField("op", StringType(), True),
            StructField("ts_ms", LongType(), True),
        ]
    )
    return StructType(
        [
            StructField("payload", payload, True),
            # schemas.enable=false envelopes carry these at top level
            StructField("before", image, True),
            StructField("after", image, True),
            StructField("op", StringType(), True),
            StructField("ts_ms", LongType(), True),
        ]
    )


def decode_debezium_values(raw: DataFrame, row_schema: StructType) -> DataFrame:
    """(key, value-json) Kafka records of Debezium envelopes -> flat
    decoded rows matching ``row_schema`` (incl. ``__deleted``), i.e.
    exactly what the post-SMT topics the reference consumes look like.
    """
    env = F.from_json(F.col("value").cast("string"), _envelope_schema(row_schema))
    # schema-wrapped or bare envelope
    op = F.coalesce(env["payload"]["op"], env["op"])
    before = F.coalesce(env["payload"]["before"], env["before"])
    after = F.coalesce(env["payload"]["after"], env["after"])
    image = F.when(op == "d", before).otherwise(after)
    deleted = F.when(op == "d", F.lit("true")).otherwise(
        F.lit(None).cast("string")
    )

    key = (
        F.col("key").cast("string")
        if "key" in raw.columns
        else F.lit(None).cast("string")
    ).alias("kafka_key")
    flat = raw.select(key, image.alias("_img"), deleted.alias("__deleted"))
    cols = [
        F.col(f"_img.{f.name}").alias(f.name)
        for f in row_schema.fields
        if f.name != "__deleted"
    ]
    out = flat.select("kafka_key", *cols, "__deleted")
    # drop rows with no image at all (malformed / heartbeat records)
    first_col = next(f.name for f in row_schema.fields if f.name != "__deleted")
    return out.where(F.col(first_col).isNotNull())
