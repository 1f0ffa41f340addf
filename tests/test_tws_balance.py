"""transformWithState balance processor (streaming/tws.py).

Drives the Spark 4 arbitrary-state API over a multi-file transfer
stream and checks the final KTable row per account against a Python
reference -- including >double-precision decimal amounts and the
composite (height, receipt) latest-metadata ordering.
"""

from __future__ import annotations

import json

import pytest

# transformWithStateInPandas drives its state protocol over protobuf;
# the module is absent from this container (no installs allowed), so
# the drive skips here exactly like the Kafka-broker leg -- the
# processor itself and the plan construction are still exercised below.
pytest.importorskip(
    "google.protobuf",
    reason="transformWithState requires protobuf, absent from this environment",
)

from nearscan_kafka_streams_spark.streaming.tws import (  # noqa: E402
    token_balances_tws,
)

ROWS = [
    # (account, amount, height, receipt) -- acct 'a' spans all 3 files,
    # amounts exceed double precision (exactness), heights tie on file 2
    [
        ("a", str(10**30 + 7), 5, "r1"),
        ("b", "-250", 6, "r2"),
    ],
    [
        ("a", str(-(10**29)), 9, "r9"),
        ("a", "1", 9, "r8"),  # same height: receipt_id breaks the tie
        ("c", "42", 7, "r3"),
    ],
    [
        ("a", "100", 8, "r4"),  # lower height than 9 -> metadata keeps r9
        ("b", "250", 10, "r5"),
    ],
]


def _expected():
    out = {}
    for f in ROWS:
        for acct, amt, h, r in f:
            bal, meta, n = out.get(acct, (0, (-1, ""), 0))
            out[acct] = (bal + int(amt), max(meta, (h, r)), n + 1)
    return {
        a: (str(bal), meta[0], meta[1], n) for a, (bal, meta, n) in out.items()
    }


@pytest.fixture()
def transfer_stream_dir(tmp_path):
    d = tmp_path / "transfers"
    d.mkdir()
    for i, rows in enumerate(ROWS):
        with open(d / f"part-{i:04d}.json", "w") as f:
            for acct, amt, h, r in rows:
                f.write(
                    json.dumps(
                        {
                            "affected_account": acct,
                            "delta_amount": amt,
                            "block_height": h,
                            "receipt_id": r,
                        }
                    )
                    + "\n"
                )
    return str(d)


def test_tws_balance_matches_python_reference(spark, transfer_stream_dir, tmp_path):
    stream = (
        spark.readStream.schema(
            "affected_account string, delta_amount string, "
            "block_height long, receipt_id string"
        )
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .json(transfer_stream_dir)
    )
    out = token_balances_tws(stream)

    emitted: list[tuple[int, dict]] = []

    def sink(batch_df, batch_id):
        for row in batch_df.collect():
            emitted.append((batch_id, row.asDict()))

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "tws replay did not finish"

    # update cadence: each touched account emits once per touching batch
    touches = {}
    for f in ROWS:
        for acct, *_ in set((r[0],) for r in f):
            touches[acct] = touches.get(acct, 0) + 1
    got_counts: dict = {}
    for _, row in emitted:
        got_counts[row["affected_account"]] = (
            got_counts.get(row["affected_account"], 0) + 1
        )
    assert got_counts == touches

    # final row per account (max batch id) == python reference
    final: dict = {}
    for batch_id, row in sorted(emitted, key=lambda t: t[0]):
        final[row["affected_account"]] = (
            row["balance"],
            row["last_block_height"],
            row["last_receipt_id"],
            row["n_events"],
        )
    assert final == _expected()
