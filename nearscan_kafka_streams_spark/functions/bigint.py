"""Arbitrary-precision integer arithmetic for amounts beyond
DecimalType's 38-digit cap.

The reference declares yocto-amounts as Avro decimal(45,0)
(near.indexer.execution_outcomes-value.avsc, token_balance/
token_transfer .avsc); Spark's DecimalType stops at precision 38
(SURVEY (S)7.4.1).  The engine's default mode maps them to
decimal(38,0) -- ample for observed magnitudes (~1e33) -- and this
module provides the optional EXACT mode: amounts carried as decimal
strings, arithmetic in Python ints under Arrow batching.

Only the balance aggregation needs it (the sole arithmetic over
amounts, TokenBalance.java:315); ``token_balances_exact`` mirrors
operators/balance.token_balances with string-carried sums.

Scale: one ``applyInPandas`` over the account-grouped shuffle -- the
same single exchange as the decimal path; Python cost is per-GROUP
big-int addition, Arrow moves only (account, amount-string, ordering)
columns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from nearscan_kafka_streams_spark.operators.balance import _META_MAP

_EXACT_OUT = StructType(
    [
        StructField("account", StringType()),
        StructField("balance", StringType()),  # decimal integer string
        *[
            StructField(dst, StringType())
            for _, dst in _META_MAP
            if dst != "index_in_chunk"
        ],
        StructField("index_in_chunk", StringType()),
    ]
)


def token_balances_exact(transfers: DataFrame) -> DataFrame:
    """A1 with arbitrary-precision sums: amounts as decimal strings.

    Input: token_transfer rows where ``affected_amount`` may be a
    string column (exact wire mode) or decimal (cast to string here).
    Output mirrors TOKEN_BALANCE_SCHEMA with string-typed balance.
    """
    slim = transfers.selectExpr(
        "affected_account",
        "CAST(affected_amount AS STRING) AS affected_amount",
        *[f"CAST({src} AS STRING) AS {src}" for src, _ in _META_MAP],
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        total = sum(int(a) for a in pdf["affected_amount"])
        # latest event by (block_timestamp, index_in_chunk) -- Python int
        # compare on the string-carried values (tuples: no pandas idxmax)
        keys = [
            (int(t), int(i))
            for t, i in zip(
                pdf["included_in_block_timestamp"], pdf["index_in_chunk"]
            )
        ]
        latest = pdf.iloc[max(range(len(keys)), key=keys.__getitem__)]
        out = {"account": pdf["affected_account"].iloc[0], "balance": str(total)}
        for src, dst in _META_MAP:
            out[dst] = str(latest[src])
        return pd.DataFrame([out])[[f.name for f in _EXACT_OUT.fields]]

    return slim.groupBy("affected_account").applyInPandas(agg, _EXACT_OUT)
