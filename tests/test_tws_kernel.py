"""BalanceProcessor kernel semantics without the protobuf transport:
the processor is plain Python over pandas batches, so its state
transition is testable with a fake ValueState -- the part the
environment-gated execution test (test_tws_balance.py) cannot reach
when protobuf is absent."""

from __future__ import annotations

import pandas as pd

from nearscan_kafka_streams_spark.streaming.tws import (
    BalanceProcessor,
    token_balances_tws,
)


class _FakeState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.state = _FakeState()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state


def _batch(rows):
    return pd.DataFrame(
        rows, columns=["delta_amount", "block_height", "receipt_id"]
    )


def test_processor_accumulates_exactly_and_orders_metadata():
    p = BalanceProcessor()
    h = _FakeHandle()
    p.init(h)

    big = 10**30 + 7  # beyond double precision
    out1 = list(
        p.handleInputRows(
            ("acct",), iter([_batch([(str(big), 5, "r1")])]), None
        )
    )
    assert out1[0]["balance"].iloc[0] == str(big)
    assert h.state.get() == (str(big), 5, "r1", 1)

    # second micro-batch: state carries over; height tie -> receipt max
    out2 = list(
        p.handleInputRows(
            ("acct",),
            iter([_batch([("-1", 9, "r8"), ("1", 9, "r9"), ("0", 8, "rX")])]),
            None,
        )
    )
    row = out2[0].iloc[0]
    assert row["balance"] == str(big)
    assert (row["last_block_height"], row["last_receipt_id"]) == (9, "r9")
    assert row["n_events"] == 4


def test_plan_construction_without_execution(spark, tmp_path):
    """Building the transformWithState plan needs no protobuf -- only
    execution does; the streaming DataFrame must construct cleanly."""
    d = tmp_path / "in"
    d.mkdir()
    stream = (
        spark.readStream.schema(
            "affected_account string, delta_amount string, "
            "block_height long, receipt_id string"
        )
        .json(str(d))
    )
    out = token_balances_tws(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema] == [
        "affected_account",
        "balance",
        "last_block_height",
        "last_receipt_id",
        "n_events",
    ]
