"""ANALYZE TABLE statistics reach the optimizer."""

from __future__ import annotations

from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.plans.stats import (
    column_stats,
    plan_sizes,
    register_and_analyze,
    table_stats,
)


def test_analyze_collects_row_and_column_stats(spark, sf_dir):
    register_and_analyze(
        spark, "stats_nation", f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name"],
    )
    try:
        ts = table_stats(spark, "stats_nation")
        assert "statistics" in ts and "rows" in ts["statistics"]
        cs = column_stats(spark, "stats_nation", "n_nationkey")
        assert int(cs["distinct_count"]) >= 20
        assert cs["max"] is not None
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_nation")


def test_stats_drive_broadcast_without_hint(spark, sf_dir):
    """With catalog stats, a filtered-small side is auto-broadcast with
    NO explicit broadcast() hint -- the stats-driven decision the
    nightly ANALYZE exists for."""
    register_and_analyze(spark, "stats_cust", f"{sf_dir}/customer.parquet")
    register_and_analyze(spark, "stats_orders", f"{sf_dir}/orders.parquet")
    try:
        j = spark.table("stats_orders").join(
            spark.table("stats_cust").where(F.col("c_nationkey") == 3),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # and the optimizer's cost view knows the sizes it used
        cost = plan_sizes(j)
        assert "sizeInBytes" in cost
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_cust")
        spark.sql("DROP TABLE IF EXISTS stats_orders")
