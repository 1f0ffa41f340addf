"""S4 parity: streamed balance changelog through the foreachBatch
keyed-upsert sink equals the batch aggregate (the reference's
Postgres-connector UPSERT behavior, README.md:273-297)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.sinks.upsert import (
    dedupe_latest,
    foreach_batch_upsert,
)


def test_foreach_batch_upsert_keyed_state(spark, tmp_path):
    target = str(tmp_path / "balances")
    upsert = foreach_batch_upsert(
        "account", target, order_cols=["block_timestamp"]
    )

    # three micro-batches of balance updates (update-mode changelog):
    # later batches overwrite earlier per-key rows
    b0 = spark.createDataFrame(
        [("a", 10, 1), ("b", 5, 1)], ["account", "balance", "block_timestamp"]
    )
    b1 = spark.createDataFrame(
        [("a", 15, 2)], ["account", "balance", "block_timestamp"]
    )
    b2 = spark.createDataFrame(
        [("b", 9, 3), ("c", 1, 3)], ["account", "balance", "block_timestamp"]
    )
    for i, b in enumerate([b0, b1, b2]):
        upsert(b, i)

    final = {
        r["account"]: r["balance"] for r in spark.read.parquet(target).collect()
    }
    assert final == {"a": 15, "b": 9, "c": 1}


def test_upsert_within_batch_dedupe(spark, tmp_path):
    """Two updates for one key in a single batch: highest order wins."""
    target = str(tmp_path / "balances2")
    upsert = foreach_batch_upsert("account", target, order_cols=["ts"])
    batch = spark.createDataFrame(
        [("a", 1, 1), ("a", 7, 2), ("b", 3, 1)], ["account", "balance", "ts"]
    )
    upsert(batch, 0)
    final = {
        r["account"]: r["balance"] for r in spark.read.parquet(target).collect()
    }
    assert final == {"a": 7, "b": 3}


def test_dedupe_latest_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("a", 3, 2)], ["k", "v", "ord"]
    )
    out = dedupe_latest(df, "k", ["ord", "v"]).collect()
    assert len(out) == 1
    assert out[0]["v"] == 3
