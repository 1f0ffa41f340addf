"""Hive-style directory partitioning: planning-time partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.sinks import write_hive_partitioned


def test_partition_filter_prunes_directories(spark, tmp_path):
    out = str(tmp_path / "part")
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("bucket"),
        (F.col("id") * 3).alias("v"),
    )
    write_hive_partitioned(df, out, ["bucket"])

    read = spark.read.parquet(out)
    q = read.where(F.col("bucket") == "2")

    plan = q._jdf.queryExecution().executedPlan().toString()
    # the predicate must land in PartitionFilters (directory pruning),
    # NOT as a post-scan data filter
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in pf

    # only files under bucket=2/ are actually read at execution
    # (inputFiles() reflects the unpruned relation, so ask the
    # executed rows which files they came from)
    files = [
        r["f"]
        for r in q.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files and all("bucket=2" in f for f in files)
    assert len(files) < len(read.inputFiles())

    assert q.count() == 250
    # partition column round-trips (it lives in the path, not the files;
    # numeric-looking path values come back type-inferred, hence str())
    assert {
        str(v) for v in q.select("bucket").distinct().toPandas()["bucket"]
    } == {"2"}


def test_partition_column_costs_no_bytes_in_files(spark, tmp_path):
    out = str(tmp_path / "part2")
    df = spark.range(100).select(
        F.col("id"), F.lit("en").alias("lang")
    )
    write_hive_partitioned(df, out, ["lang"])
    # reading a single leaf dir directly yields the file-borne columns only
    leaf = spark.read.parquet(out + "/lang=en")
    assert leaf.columns == ["id"]
