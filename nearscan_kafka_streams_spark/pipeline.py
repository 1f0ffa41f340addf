"""End-to-end topology wiring (batch).

The reference builds one fixed DAG (TokenBalance.buildKafkaStreams,
TokenBalance.java:74-336):

  stream x3 -> dedup -> join -> join -> filter -> flatMap
     -> token_transfer sink
     -> groupBy(account).aggregate -> token_balance sink

This module is the batch expression of that DAG over three input
DataFrames; ``streaming/pipeline.py`` is the streaming shell over the
same operator functions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from nearscan_kafka_streams_spark.config import DEFAULT_CONFIG, PipelineConfig
from nearscan_kafka_streams_spark.operators.balance import token_balances
from nearscan_kafka_streams_spark.operators.dedup import dedup_batch
from nearscan_kafka_streams_spark.operators.joins import (
    join_receipts_outcomes_actions,
)
from nearscan_kafka_streams_spark.operators.transfers import extract_transfers


@dataclass
class PipelineOutput:
    transfers: DataFrame
    balances: DataFrame


def run_batch(
    receipts: DataFrame,
    outcomes: DataFrame,
    actions: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> PipelineOutput:
    """The full topology, batch mode.

    Dedup keys mirror the reference's composite event ids
    (TokenBalance.java:96-113): receipts/outcomes key on receipt_id,
    actions on (receipt_id, index_in_action_receipt).
    """
    r = dedup_batch(receipts, ["receipt_id"])
    o = dedup_batch(outcomes, ["receipt_id"])
    a = dedup_batch(actions, ["receipt_id", "index_in_action_receipt"])

    tol = (
        _tolerance_seconds(config.batch_join_tolerance)
        if config.batch_join_tolerance is not None
        else None
    )
    joined = join_receipts_outcomes_actions(r, o, a, tolerance_seconds=tol)
    transfers = extract_transfers(joined, config.token_address)
    balances = token_balances(transfers)
    return PipelineOutput(transfers=transfers, balances=balances)


def _tolerance_seconds(spec: str) -> float:
    """'2 seconds' / '500 milliseconds' / '1 minute' -> seconds."""
    value, unit = spec.split()
    mult = {
        "millisecond": 0.001,
        "milliseconds": 0.001,
        "second": 1.0,
        "seconds": 1.0,
        "minute": 60.0,
        "minutes": 60.0,
        "hour": 3600.0,
        "hours": 3600.0,
    }[unit]
    return float(value) * mult
