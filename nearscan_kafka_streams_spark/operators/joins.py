"""J1/J2: receipts x execution_outcomes x action_receipt_actions joins.

Reference: two chained stream-stream windowed inner equi-joins on the
Kafka message key (= receipt_id), match iff |t_left - t_right| <= 2 s
(``JoinWindows.of(Duration.ofMillis(2000))``, TokenBalance.java:116-122).
Output is a nested {receipt, outcome, action} record
(near.indexer.receipts_outcomes_actions-value.avsc); we produce the
idiomatic flat joined row instead (SURVEY (S)1.2) -- the downstream
projection (transfers.py) reads specific fields either way.

Column-name collisions across the three inputs (``index_in_chunk`` on
receipts AND outcomes; ``__deleted`` on all) are resolved by prefixing
outcome/action collision columns.

Scale notes:
- batch: a plain 3-way equi-join on ``receipt_id``; Catalyst picks
  sort-merge (both sides large) and AQE handles skew.  The time-range
  predicate is applied as a post-join filter on the same row -- cheap.
- streaming: watermark + time-range condition so Spark can bound join
  state (state pruned once the watermark passes the range).  Join state
  is hash-partitioned by receipt_id across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.schemas import with_event_time

# columns of each input that survive into the flat joined row, in the
# order the nested record exposes them
_RECEIPT_COLS = [
    "receipt_id",
    "included_in_block_hash",
    "included_in_chunk_hash",
    "index_in_chunk",
    "included_in_block_timestamp",
    "predecessor_account_id",
    "receiver_account_id",
    "receipt_kind",
    "originated_from_transaction_hash",
]
_OUTCOME_COLS = [
    "executed_in_block_hash",
    "executed_in_block_timestamp",
    ("index_in_chunk", "outcome_index_in_chunk"),
    "gas_burnt",
    "tokens_burnt",
    "executor_account_id",
    "status",
    "shard_id",
]
_ACTION_COLS = [
    "index_in_action_receipt",
    "action_kind",
    "args",
]


def _select(df: DataFrame, cols: list, extra: list | None = None) -> DataFrame:
    out = []
    for c in cols:
        if isinstance(c, tuple):
            out.append(F.col(c[0]).alias(c[1]))
        else:
            out.append(F.col(c))
    return df.select(*out, *(extra or []))


def join_receipts_outcomes_actions(
    receipts: DataFrame,
    outcomes: DataFrame,
    actions: DataFrame,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Batch 3-way join, optionally bounded by a +/- time tolerance.

    The reference's JoinWindows.of(2000ms) runs on Kafka INGEST time
    (its event-time extractors are commented out), so a NEAR delayed
    receipt whose outcome executes minutes of block time later still
    joins there.  Batch default here is therefore UNBOUNDED -- a plain
    equi-join on receipt_id loses no delayed executions.  Pass
    ``tolerance_seconds`` to bound on BLOCK time (the event time the
    disabled extractors intended, SURVEY (S)7.4.3); expected row-loss
    mode: outcomes executing > tolerance after inclusion are dropped.
    The streaming path keeps a tight bound regardless -- there it
    prunes join state, which is a resource necessity, not semantics.
    """
    r = _select(receipts, _RECEIPT_COLS)
    o = _select(outcomes, ["receipt_id", *_OUTCOME_COLS])
    a = _select(actions, ["receipt_id", *_ACTION_COLS])

    ro = r.join(o, "receipt_id", "inner")
    if tolerance_seconds is not None:
        tol_ns = int(tolerance_seconds * 1_000_000_000)
        ro = ro.where(
            F.abs(
                F.col("executed_in_block_timestamp")
                - F.col("included_in_block_timestamp")
            )
            <= F.lit(tol_ns)
        )
    # J2: actions carry the receipt's own block timestamp (denormalized),
    # so the +/-2 s check against the receipt is identically 0 -- but we
    # keep the predicate form for parity with the reference topology.
    return ro.join(a, "receipt_id", "inner")


def join_receipts_outcomes_actions_stream(
    receipts: DataFrame,
    outcomes: DataFrame,
    actions: DataFrame,
    tolerance: str = "2 seconds",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming chained stream-stream interval joins (Spark >=3.5).

    Inputs are streaming DataFrames already carrying their schema
    columns; event_time columns are derived here from the block
    timestamps.  Watermarks bound the buffered join state.
    """
    # Each input carries exactly one watermark definition: if the caller
    # already derived + watermarked the et column (e.g. upstream
    # dropDuplicatesWithinWatermark -- redefining a watermark is
    # disallowed), reuse it; otherwise derive and watermark here.
    if "r_et" in receipts.columns:
        r = _select(receipts, [*_RECEIPT_COLS, "r_et"])
    else:
        r = with_event_time(
            _select(receipts, _RECEIPT_COLS), "included_in_block_timestamp", "r_et"
        ).withWatermark("r_et", watermark)
    if "o_et" in outcomes.columns:
        o = _select(outcomes, ["receipt_id", *_OUTCOME_COLS, "o_et"])
    else:
        o = with_event_time(
            _select(outcomes, ["receipt_id", *_OUTCOME_COLS]),
            "executed_in_block_timestamp",
            "o_et",
        ).withWatermark("o_et", watermark)
    if "a_et" in actions.columns:
        a = _select(actions, ["receipt_id", *_ACTION_COLS, "a_et"])
    else:
        a = (
            with_event_time(
                _select(
                    actions,
                    [
                        "receipt_id",
                        "receipt_included_in_block_timestamp",
                        *_ACTION_COLS,
                    ],
                ),
                "receipt_included_in_block_timestamp",
                "a_et",
            )
            .drop("receipt_included_in_block_timestamp")
            .withWatermark("a_et", watermark)
        )

    ro = r.alias("r").join(
        o.alias("o"),
        F.expr(
            f"""
            r.receipt_id = o.receipt_id AND
            o.o_et BETWEEN r.r_et - INTERVAL {tolerance}
                       AND r.r_et + INTERVAL {tolerance}
            """
        ),
        "inner",
    ).drop(o.receipt_id)

    return ro.alias("ro").join(
        a.alias("a"),
        F.expr(
            f"""
            ro.receipt_id = a.receipt_id AND
            a.a_et BETWEEN ro.r_et - INTERVAL {tolerance}
                       AND ro.r_et + INTERVAL {tolerance}
            """
        ),
        "inner",
    ).drop(a.receipt_id)
