"""Running balance as a Spark 4 ``StatefulProcessor`` (transformWithState).

The reference's aggregate is a KTable: per-account running sum plus
latest-event metadata kept in a RocksDB store and re-emitted on every
update (TokenBalance.java:279-329).  The built-in update-mode
aggregation (`operators/balance.py::token_balances`) already covers it;
this module re-expresses the same contract on the ARBITRARY-STATE API
(`transformWithStateInPandas`, Spark >= 4.0) -- the modern successor to
``applyInPandasWithState`` -- because a real deployment reaches for it
the moment the state transition stops being expressible as an
aggregate (conditional resets, per-key TTL, side outputs):

* ``ValueState`` holds exactly one row per account (the KTable row):
  running sum halves as integer micros of the decimal amount, plus the
  (block_height, receipt_id) composite-max metadata -- the same
  ordering ``max_by`` uses in the batch aggregate.
* State lives in the RocksDB state store (the session default here),
  surviving restarts via the checkpoint -- the direct analog of the
  reference's changelog-backed store.
* Update-mode emission: one output row per account per micro-batch
  that touched it, exactly the reference's forward() cadence.

ENVIRONMENT GATE: executing transformWithState requires the
``protobuf`` package (the Python<->JVM state protocol); this container
ships without it, so the execution test skips with that reason
(tests/test_tws_balance.py) while the kernel and plan construction are
tested protobuf-free (tests/test_tws_kernel.py) -- the same
documented-gate pattern as the Kafka broker leg.

Amounts ride as STRINGS end-to-end (decimal(38,0) semantics; Arrow
cannot carry decimal128 through this path losslessly) and accumulate
in Python ints -- exact at any magnitude, matching
``functions/bigint.py``'s exact mode rather than the p<=38 fast path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("balance_str", StringType()),
        StructField("last_height", LongType()),
        StructField("last_receipt", StringType()),
        StructField("n_events", LongType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("affected_account", StringType()),
        StructField("balance", StringType()),
        StructField("last_block_height", LongType()),
        StructField("last_receipt_id", StringType()),
        StructField("n_events", LongType()),
    ]
)


class BalanceProcessor(StatefulProcessor):
    """Per-account KTable row: exact running sum + composite-max
    (block_height, receipt_id) latest-event metadata."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("balance", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (account,) = key
        if self._state.exists():
            bal_s, height, receipt, n = self._state.get()
            bal = int(bal_s)
        else:
            bal, height, receipt, n = 0, -1, "", 0
        for pdf in rows:
            for amt, h, r in zip(
                pdf["delta_amount"], pdf["block_height"], pdf["receipt_id"]
            ):
                bal += int(amt)  # exact at any precision
                n += 1
                hi = int(h)
                # composite max: (height, receipt_id), the batch
                # aggregate's max_by ordering
                if (hi, r) >= (height, receipt):
                    height, receipt = hi, r
        self._state.update((str(bal), height, receipt, n))
        yield pd.DataFrame(
            {
                "affected_account": [account],
                "balance": [str(bal)],
                "last_block_height": [height],
                "last_receipt_id": [receipt],
                "n_events": [n],
            }
        )

    def close(self) -> None:
        pass


def token_balances_tws(transfers: DataFrame) -> DataFrame:
    """Streaming per-account balances via transformWithStateInPandas.

    Input: the transfer stream (affected_account, delta_amount decimal,
    block_height, receipt_id).  Output: update-mode KTable rows.
    """
    prepared = transfers.select(
        "affected_account",
        F.col("delta_amount").cast("decimal(38,0)").cast("string").alias(
            "delta_amount"
        ),
        F.col("block_height").cast("long").alias("block_height"),
        F.col("receipt_id").cast("string").alias("receipt_id"),
    )
    return prepared.groupBy("affected_account").transformWithStateInPandas(
        statefulProcessor=BalanceProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
