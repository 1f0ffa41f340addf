"""Wire-bytes end-to-end: Confluent-framed Avro logs -> custom Python
DataSource (streaming) -> full reference topology -> balance store.

The deepest in-sandbox S1 closure: the value bytes are exactly what a
Connect producer frames onto the topic, and everything downstream is
the production topology -- only the socket to a broker is simulated by
the segment files."""

from __future__ import annotations

from nearscan_kafka_streams_spark.pipeline import run_batch
from nearscan_kafka_streams_spark.schemas import avro_value_schema
from nearscan_kafka_streams_spark.serde.avro import (
    AvroCodec,
    confluent_frame,
)
from nearscan_kafka_streams_spark.sources.pyds import write_framed_log
from nearscan_kafka_streams_spark.streaming.pipeline import run_wire_pipeline


def _stage_topic(df, topic: str, out_dir, n_files: int = 2) -> None:
    codec = AvroCodec(avro_value_schema(topic))
    framed = [
        confluent_frame(1, codec.encode(row.asDict())) for row in df.collect()
    ]
    for i in range(n_files):
        write_framed_log(
            framed[i::n_files],
            str(out_dir / topic / f"part-{i:05d}.bin"),
        )


def test_wire_topology_matches_batch(spark, tmp_path):
    from fixtures_near import to_dataframes

    r, o, a, _ = to_dataframes(spark)
    logs = tmp_path / "logs"
    _stage_topic(r, "receipts", logs)
    _stage_topic(o, "execution_outcomes", logs)
    _stage_topic(a, "action_receipt_actions", logs)

    balances = run_wire_pipeline(
        spark, str(logs), str(tmp_path / "out")
    )
    got = {
        row["account"]: str(row["balance"]) for row in balances.collect()
    }

    # batch reference under the same ±2 s join window the streaming
    # topology runs (batch default is unbounded tolerance; the fixture
    # set includes a delayed-execution pair that only joins unbounded)
    from nearscan_kafka_streams_spark.config import PipelineConfig

    want_df = run_batch(
        r, o, a, config=PipelineConfig(batch_join_tolerance="2 seconds")
    ).balances
    want = {
        row["account"]: str(row["balance"]) for row in want_df.collect()
    }
    assert got == want and len(got) > 0


def test_parquet_topology_matches_wire(spark, tmp_path):
    """run_parquet_pipeline (the all-JVM control / migration-target
    shape) must produce the identical balance store as the wire path on
    the same inputs."""
    from fixtures_near import to_dataframes

    from nearscan_kafka_streams_spark.streaming.pipeline import (
        run_parquet_pipeline,
    )

    r, o, a, _ = to_dataframes(spark)
    logs = tmp_path / "logs"
    _stage_topic(r, "receipts", logs)
    _stage_topic(o, "execution_outcomes", logs)
    _stage_topic(a, "action_receipt_actions", logs)
    for topic, df in (
        ("receipts", r),
        ("execution_outcomes", o),
        ("action_receipt_actions", a),
    ):
        df.write.mode("overwrite").parquet(str(tmp_path / "pq" / topic))

    wire = run_wire_pipeline(spark, str(logs), str(tmp_path / "out_wire"))
    jvm = run_parquet_pipeline(
        spark, str(tmp_path / "pq"), str(tmp_path / "out_pq")
    )
    got_wire = {
        row["account"]: str(row["balance"]) for row in wire.collect()
    }
    got_jvm = {row["account"]: str(row["balance"]) for row in jvm.collect()}
    assert got_wire == got_jvm and len(got_jvm) > 0
