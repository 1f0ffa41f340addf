"""U2 arbitrary-state EXECUTION: the reference's KTable contract on
``applyInPandasWithState`` (streaming/apws.py), driven end-to-end --
multi-micro-batch replay through real GroupState, checkpoint-resume
state survival, and >38-digit exactness.  This is the executable twin
of the protobuf-gated ``transformWithStateInPandas`` path
(streaming/tws.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.streaming.apws import token_balances_apws

SCHEMA = (
    "affected_account string, delta_amount decimal(38,0), "
    "block_height long, receipt_id string"
)

ROWS_A = [
    ("alice", "100", 1, "r1"),
    ("bob", "7", 1, "r2"),
    ("alice", "-40", 2, "r3"),
]
ROWS_B = [
    ("alice", "1", 3, "r4"),
    ("carol", "5", 3, "r5"),
]
ROWS_C = [
    ("bob", "-7", 4, "r6"),
    ("alice", "2", 2, "r0"),  # late event: lower height, metadata keeps r4
]


def _dump(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for acc, amt, h, r in rows:
            f.write(
                json.dumps(
                    {
                        "affected_account": acc,
                        "delta_amount": amt,
                        "block_height": h,
                        "receipt_id": r,
                    }
                )
                + "\n"
            )


def _run(spark, src, ckpt, name, out=None):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    # foreachBatch parquet appender: unlike the memory sink it supports
    # checkpoint RECOVERY, which the resume test depends on
    out = out or (ckpt.parent / f"{name}_emissions")

    def _sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out))

    q = (
        token_balances_apws(stream)
        .writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    emissions = spark.read.parquet(str(out)).collect()
    # n_events is strictly monotone per account -> the max-n row IS the
    # final state even though update mode re-emits per micro-batch
    final = {}
    for r in emissions:
        cur = final.get(r["affected_account"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["affected_account"]] = r
    return emissions, final


def test_apws_multibatch_equals_batch_aggregate(spark, tmp_path):
    src = tmp_path / "src"
    _dump(src / "a.json", ROWS_A)
    _dump(src / "b.json", ROWS_B)

    emissions, final = _run(spark, src, tmp_path / "ckpt", "apws_t1")
    # maxFilesPerTrigger=1 -> alice touched in both batches -> >=2 emissions
    assert sum(1 for r in emissions if r["affected_account"] == "alice") >= 2

    from decimal import Decimal

    batch = spark.createDataFrame(
        [
            (acc, Decimal(amt), h, r)
            for rows in (ROWS_A, ROWS_B)
            for acc, amt, h, r in rows
        ],
        SCHEMA,
    )
    expect = {
        r["affected_account"]: r
        for r in batch.groupBy("affected_account")
        .agg(
            F.sum("delta_amount").cast("decimal(38,0)").cast("string").alias("balance"),
            F.max(
                F.struct("block_height", "receipt_id")
            ).alias("m"),
            F.count("*").alias("n_events"),
        )
        .select(
            "affected_account",
            "balance",
            F.col("m.block_height").alias("last_block_height"),
            F.col("m.receipt_id").alias("last_receipt_id"),
            "n_events",
        )
        .collect()
    }
    assert set(final) == set(expect)
    for acc, r in expect.items():
        got = final[acc]
        assert got["balance"] == r["balance"], acc
        assert got["last_block_height"] == r["last_block_height"], acc
        assert got["last_receipt_id"] == r["last_receipt_id"], acc
        assert got["n_events"] == r["n_events"], acc


def test_apws_state_survives_checkpoint_resume(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    _dump(src / "a.json", ROWS_A)
    _dump(src / "b.json", ROWS_B)
    _run(spark, src, ckpt, "apws_t2a")

    # new files arrive; resuming from the SAME checkpoint must carry the
    # GroupState forward (only ROWS_C is reprocessed)
    _dump(src / "c.json", ROWS_C)
    emissions, final = _run(spark, src, ckpt, "apws_t2b")
    assert final["bob"]["balance"] == "0"
    assert final["bob"]["n_events"] == 2
    # late low-height event updates the balance but NOT the metadata
    assert final["alice"]["balance"] == "63"
    assert final["alice"]["n_events"] == 4
    assert final["alice"]["last_block_height"] == 3
    assert final["alice"]["last_receipt_id"] == "r4"


def test_apws_exact_beyond_38_digits(spark, tmp_path):
    # decimal(38,0) caps the COLUMN, so feed maximal column values and
    # let the STATE accumulate past 38 digits: 4 * (10^37) repeated --
    # the Python-int accumulator must stay exact where a double (or
    # even decimal(38)) would not
    big = str(10**37)
    rows = [("whale", big, i, f"r{i}") for i in range(12)]
    src = tmp_path / "src"
    _dump(src / "a.json", rows[:6])
    _dump(src / "b.json", rows[6:])
    _, final = _run(spark, src, tmp_path / "ckpt", "apws_t3")
    assert final["whale"]["balance"] == str(12 * 10**37)  # 39 digits
    assert final["whale"]["n_events"] == 12
