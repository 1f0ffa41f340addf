"""Streaming data-quality monitor: per-batch scoring, quarantine split,
and log idempotence under re-delivery."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from nearscan_kafka_streams_spark.functions.checks import TableChecks
from nearscan_kafka_streams_spark.streaming.quality import (
    quality_log_batch,
    read_quality_log,
    run_quality_monitor,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("score", DoubleType()),
    ]
)

def _checks() -> TableChecks:
    # built lazily: Column expressions need an active SparkContext
    return TableChecks(
        complete=["doc_id", "text"],
        satisfies={"score_in_range": F.col("score").between(0.0, 1.0)},
    )


def _write_batch(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    f = path / f"b{len(list(path.iterdir()))}.json"
    f.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_monitor_scores_each_batch_and_splits_quarantine(spark, tmp_path):
    land = tmp_path / "landing"
    _write_batch(land, [
        {"doc_id": 1, "text": "ok", "score": 0.5},
        {"doc_id": 2, "text": None, "score": 0.9},      # null text
        {"doc_id": 3, "text": "bad", "score": 7.0},      # out of range
    ])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(land))
    )
    q = run_quality_monitor(
        stream,
        _checks(),
        out_dir=str(tmp_path / "out"),
        log_dir=str(tmp_path / "log"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        fail_filter=(
            F.col("text").isNotNull()
            & F.col("score").between(0.0, 1.0)
        ),
        quarantine_dir=str(tmp_path / "quar"),
    )
    q.awaitTermination(120)

    log = {
        r["check_name"]: r["observed"]
        for r in read_quality_log(spark, str(tmp_path / "log")).collect()
    }
    assert log["complete:text"] == 1
    assert log["satisfies:score_in_range"] == 1
    assert log["complete:doc_id"] == 0

    kept = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r["doc_id"] for r in kept.collect()) == [1]
    quar = spark.read.parquet(str(tmp_path / "quar"))
    assert sorted(r["doc_id"] for r in quar.collect()) == [2, 3]


def test_monitor_accumulates_across_micro_batches(spark, tmp_path):
    land = tmp_path / "landing2"
    _write_batch(land, [{"doc_id": 1, "text": "a", "score": 0.1}])
    _write_batch(land, [{"doc_id": 2, "text": None, "score": 0.2}])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(land))
    )
    q = run_quality_monitor(
        stream,
        _checks(),
        out_dir=str(tmp_path / "out2"),
        log_dir=str(tmp_path / "log2"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(120)
    log = read_quality_log(spark, str(tmp_path / "log2"))
    # one report row per (batch, check); 2 batches x 3 checks
    assert log.count() == 6
    per_batch = {
        (r["batch_id"], r["check_name"]): (r["observed"], r["batch_rows"])
        for r in log.collect()
    }
    # each micro-batch saw exactly one row; one of them carried the
    # null text (file->batch order is not contractual)
    text_checks = sorted(
        v for (b, name), v in per_batch.items() if name == "complete:text"
    )
    assert text_checks == [(0, 1), (1, 1)]
    # with no fail_filter, everything lands in out
    assert spark.read.parquet(str(tmp_path / "out2")).count() == 2


def test_log_read_is_idempotent_under_redelivery(spark, tmp_path):
    """foreachBatch may re-deliver a batch (at-least-once): the log
    reader's (batch_id, check_name) dedup must collapse the duplicate
    report rows -- same contract as the reference's idempotent upsert."""
    df = spark.createDataFrame(
        [(1, "a", 0.5), (2, None, 0.6)], SCHEMA
    )
    quality_log_batch(df, 7, _checks(), str(tmp_path / "log3"))
    quality_log_batch(df, 7, _checks(), str(tmp_path / "log3"))  # replay
    log = read_quality_log(spark, str(tmp_path / "log3"))
    assert log.count() == 3  # 3 checks, not 6
    assert log.where(
        (F.col("check_name") == "complete:text") & (F.col("observed") == 1)
    ).count() == 1
