"""Running balance as an ARBITRARY-STATE streaming operator that
EXECUTES in this environment: ``applyInPandasWithState`` (Spark >= 3.4).

Same contract as ``streaming/tws.py`` (the Spark-4
``transformWithStateInPandas`` successor, env-gated here on a missing
``protobuf``): the reference's KTable row per account -- exact running
sum plus composite-max (block_height, receipt_id) latest-event
metadata, re-emitted on every update (TokenBalance.java:279-329).
Unlike tws, this path needs no extra packages, so the custom stateful
operator story is exercised END-TO-END: multi-micro-batch replay
through real GroupState equals the batch aggregate
(tests/test_apws_balance.py).

* ``GroupState`` holds exactly one tuple per account (the KTable row);
  it lives in the state store and survives restarts via the
  checkpoint -- the analog of the reference's changelog-backed store.
* Update-mode emission: one output row per account per micro-batch
  that touched it, the reference's forward() cadence.
* Amounts ride as STRINGS (decimal(38,0) semantics; Arrow cannot carry
  decimal128 losslessly through this path) and accumulate in Python
  ints -- exact at any magnitude, matching ``functions/bigint.py``'s
  exact mode.

Scale shape: state is partitioned by the grouping key across
executors; each micro-batch shuffles only the batch rows (state never
moves), and the per-key Python work is O(batch rows for that key) over
Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# (balance_str, last_height, last_receipt, n_events)
_STATE_SCHEMA = (
    "balance_str string, last_height long, last_receipt string, "
    "n_events long"
)

_OUT_SCHEMA = (
    "affected_account string, balance string, last_block_height long, "
    "last_receipt_id string, n_events long"
)


def balance_update_fn(
    key, rows: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-account state transition: exact running sum + composite-max
    (block_height, receipt_id) metadata -- the batch aggregate's
    ``sum`` + ``max_by`` ordering, expressed imperatively."""
    (account,) = key
    if state.exists:
        bal_s, height, receipt, n = state.get
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
            if (hi, r) >= (height, receipt):
                height, receipt = hi, r
    state.update((str(bal), height, receipt, n))
    yield pd.DataFrame(
        {
            "affected_account": [account],
            "balance": [str(bal)],
            "last_block_height": [height],
            "last_receipt_id": [receipt],
            "n_events": [n],
        }
    )


def token_balances_apws(transfers: DataFrame) -> DataFrame:
    """Streaming per-account balances via ``applyInPandasWithState``.

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
    return prepared.groupBy("affected_account").applyInPandasWithState(
        balance_update_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
