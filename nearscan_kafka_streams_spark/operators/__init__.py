"""Core operators of the token-balance topology, as pure
``DataFrame -> DataFrame`` functions shared by batch and streaming.

- ``dedup``      -- T1: at-least-once CDC dedup (TokenBalance.java:369-427)
- ``joins``      -- J1/J2: receipt x outcome x action interval joins (:116-122)
- ``transfers``  -- P1+P2+U1: filter + transfer extraction flat-map (:128-270)
- ``balance``    -- A1: per-account running balance + latest-event metadata (:279-329)
"""

from nearscan_kafka_streams_spark.operators.balance import token_balances
from nearscan_kafka_streams_spark.operators.dedup import (
    dedup_batch,
    dedup_stream,
)
from nearscan_kafka_streams_spark.operators.joins import (
    join_receipts_outcomes_actions,
    join_receipts_outcomes_actions_stream,
)
from nearscan_kafka_streams_spark.operators.transfers import extract_transfers

__all__ = [
    "dedup_batch",
    "dedup_stream",
    "extract_transfers",
    "join_receipts_outcomes_actions",
    "join_receipts_outcomes_actions_stream",
    "token_balances",
]
