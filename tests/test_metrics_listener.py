"""Metrics-export parity: the reference ships per-task JMX->Prometheus
(pom.xml:320-325); ProgressCapture is the StreamingQueryListener
equivalent -- rates, state rows, and observed metrics per batch."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.streaming.metrics import ProgressCapture


def test_progress_capture_rates_state_and_observed(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        (src / f"{i}.json").write_text(
            "\n".join(json.dumps({"k": j % 5, "v": 1}) for j in range(20)) + "\n"
        )

    cap = ProgressCapture(jsonl_path=str(tmp_path / "metrics.jsonl"))
    spark.streams.addListener(cap)
    try:
        stream = (
            spark.readStream.schema("k long, v long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        agg = (
            stream.observe("ingest", F.count(F.lit(1)).alias("rows"))
            .groupBy("k")
            .agg(F.sum("v").alias("total"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("metrics_listener_out")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        # listener delivery is asynchronous; poll briefly
        for _ in range(120):
            if cap.total_input_rows() >= 60 and cap.metric("ingest"):
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(cap)

    assert cap.total_input_rows() == 60  # 3 files x 20 rows
    assert cap.state_rows_total() == 5  # one state row per key
    ingest = cap.metric("ingest")
    assert ingest is not None and ingest["rows"] > 0
    rates = [r for r in cap.rows() if "processedRowsPerSecond" in r]
    assert rates  # throughput surfaced per batch
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert lines and "numInputRows" in lines[0]  # scrapeable export
