"""Approx-sketch accuracy, reset utility, Kafka-absence behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.queries import _t, approx_sketches_events
from nearscan_kafka_streams_spark.streaming.reset import reset_pipeline


def test_approx_sketches_within_bounds(spark, sf_dir):
    approx = {
        r["event_type"]: r for r in approx_sketches_events(spark, sf_dir).collect()
    }
    e = _t(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("median"),
        )
        .collect()
    }
    for etype, row in exact.items():
        rel = abs(approx[etype]["approx_users"] - row["users"]) / max(row["users"], 1)
        assert rel <= 0.1, (etype, approx[etype]["approx_users"], row["users"])
        # percentile_approx default accuracy: within the value spread
        assert abs(approx[etype]["approx_median"] - row["median"]) <= max(
            abs(row["median"]) * 0.25, 5.0
        )


def test_reset_pipeline(tmp_path):
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    ckpt.mkdir()
    out.mkdir()
    (ckpt / "offsets").mkdir()
    removed = reset_pipeline(str(ckpt), [str(out)])
    assert set(removed) == {str(ckpt), str(out)}
    assert not ckpt.exists() and not out.exists()
    # reset of a never-run pipeline is a no-op
    assert reset_pipeline(str(ckpt)) == []


def test_kafka_source_reports_missing_connector(spark):
    """This container has no kafka connector jar; the source must fail
    with the standard actionable Spark error (deploy instructions), not
    something opaque from our wrapper."""
    from nearscan_kafka_streams_spark.schemas import RECEIPTS_SCHEMA
    from nearscan_kafka_streams_spark.sources.kafka import read_topic_stream

    with pytest.raises(Exception, match="kafka"):
        read_topic_stream(
            spark,
            "near.indexer.receipts",
            RECEIPTS_SCHEMA,
            "included_in_block_timestamp",
        )


def test_profile_table_nulls_and_distinct(spark):
    """Profile counters on a crafted table with nulls (testdata has
    none): count(col) skips nulls, countDistinct skips nulls, min/max
    cast AFTER aggregation (numeric order, not lexicographic)."""
    from nearscan_kafka_streams_spark.functions.profiling import profile_table

    df = spark.createDataFrame(
        [(100, "a"), (99, None), (100, "b"), (None, "b")],
        ["k", "s"],
    )
    got = {
        r["column_name"]: (
            r["n_rows"], r["n_nonnull"], r["n_distinct"],
            r["min_value"], r["max_value"],
        )
        for r in profile_table(df).collect()
    }
    # min 99 < 100 numerically (lexicographic would give "100" < "99")
    assert got["k"] == (4, 3, 2, "99", "100")
    assert got["s"] == (4, 3, 2, "a", "b")
    approx = {
        r["column_name"]: r["n_distinct"]
        for r in profile_table(df, exact_distinct=False).collect()
    }
    assert approx["k"] == 2 and approx["s"] == 2  # HLL exact at tiny n


def test_write_range_clustered_prunes(spark, tmp_path):
    """Range-clustered output must give each file a narrow,
    pairwise-non-overlapping key range (the property parquet
    min/max skipping needs), and a point filter must read less
    than the full row count (row-group pruning observable via
    the scan's numOutputRows on a filter-pushed read)."""
    import pyarrow.parquet as pq

    from nearscan_kafka_streams_spark.sinks import write_range_clustered

    df = spark.range(0, 100_000).selectExpr(
        "id", "cast(id % 977 as long) as k", "id * 2 as v"
    )
    out = str(tmp_path / "clustered")
    write_range_clustered(df.orderBy(F.rand(seed=7)), out, ["k"], num_files=8)

    files = sorted((tmp_path / "clustered").glob("*.parquet"))
    assert len(files) == 8
    ranges = []
    for f in files:
        md = pq.read_metadata(str(f))
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "k"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo, f"overlapping file ranges {a_hi} > {b_lo}"

    back = spark.read.parquet(out).where("k = 42")
    assert back.count() == df.where("k = 42").count()


def test_global_running_sum_matches_window(spark):
    """Distributed two-pass prefix scan == single-task global window,
    and the BIG table never passes through a SinglePartition exchange
    (only the per-partition-totals side, ~num_partitions rows, does)."""
    from pyspark.sql.window import Window

    from nearscan_kafka_streams_spark.functions.scan import global_running_sum

    df = spark.range(0, 10_000).selectExpr(
        "id as k", "cast(pmod(id * 2654435761, 97) as long) as v"
    )
    got = global_running_sum(df, "k", "v", num_partitions=16)
    expect = df.withColumn(
        "running", F.sum("v").over(Window.orderBy("k"))
    )
    assert (
        got.join(expect.withColumnRenamed("running", "r2"), "k")
        .where("running != r2")
        .count()
        == 0
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") == 1
