"""P1 + P2 + U1: filter and transfer extraction.

Reference: TokenBalance.java:148-270 --
filter (:149-151): keep rows where
  receipt.receiver_account_id == token.address
  AND outcome.status != 'FAILURE'
  AND action.action_kind == 'FUNCTION_CALL'
then ``flatMapValues`` (:152-270): parse ``args`` JSON, switch on
``method_name``, emit 0/1/2 ``token_transfer`` records:

  new                 -> 1 leg: owner_id       +total_supply  (:175-184)
  mint                -> 1 leg: account_id     +amount        (:185-194)
  withdraw            -> 1 leg: predecessor    -amount        (:195-204)
  ft_transfer         -> 2 legs: predecessor -amount / receiver_id +amount (:205-221)
  ft_resolve_transfer -> 2 legs: sender_id   -amount / receiver_id +amount (:251-267)
  ft_transfer_call    -> 0 legs (handler commented out, :222-238)
  anything else       -> 0 legs (switch falls through, :156/:269)

Spark-first design (SURVEY (S)2.7 U1): the whole flat-map is pure column
expressions -- one ``from_json`` with a declared schema, a CASE building
``array<struct>`` per method, then ``explode``.  Fully inside
whole-stage codegen; no Python executes per row, so the operator scales
linearly with executors and Catalyst can push the filter into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.schemas import (
    AMOUNT_TYPE,
    ARGS_JSON_SCHEMA,
    TOKEN_TRANSFER_SCHEMA,
)

# the 16 pass-through columns of token_transfer (P2, TokenBalance.java:128-146)
_PASSTHROUGH = [
    "receipt_id",
    "included_in_block_hash",
    "included_in_chunk_hash",
    "index_in_chunk",
    "included_in_block_timestamp",
    "predecessor_account_id",
    "receiver_account_id",
    "originated_from_transaction_hash",
    "gas_burnt",
    "tokens_burnt",
    "executor_account_id",
    "status",
    "shard_id",
    "index_in_action_receipt",
    "action_kind",
    "args",
]

_LEG_FIELDS = [
    "affected_account",
    "affected_amount",
    "affected_reason",
    "transfer_from",
    "transfer_to",
]


def _leg(
    account: Column,
    amount: Column,
    reason: str,
    from_: Column,
    to: Column,
    raw_amount: Column | None = None,
) -> Column:
    return F.struct(
        account.alias("affected_account"),
        # try_cast: ANSI-mode-safe; malformed amount strings become NULL
        # legs which extract_transfers drops (the reference NPEs instead)
        amount.try_cast(AMOUNT_TYPE).alias("affected_amount"),
        F.lit(reason).alias("affected_reason"),
        from_.alias("transfer_from"),
        to.alias("transfer_to"),
        # raw string kept alongside so the drop filter can OBSERVE (not
        # silently lose) amounts that only failed the decimal(38) cap
        (raw_amount if raw_amount is not None else amount)
        .cast("string")
        .alias("_raw_amount"),
    )


def transfer_legs_expr(
    method: Column, args_json: Column, predecessor: Column, receiver: Column
) -> Column:
    """CASE on method_name -> array<struct> of 0/1/2 transfer legs.

    ``args_json`` is the decoded struct column (ARGS_JSON_SCHEMA.args_json);
    amounts arrive as decimal-integer strings and are cast to
    decimal(38,0) (F2, TokenBalance.java:178 etc.; negate = unary minus,
    F3 :198/:208/:254).
    """
    amount = args_json["amount"]
    return (
        F.when(
            method == "new",
            F.array(
                _leg(
                    args_json["owner_id"],
                    args_json["total_supply"],
                    "new",
                    predecessor,  # caller (TokenBalance.java:181)
                    args_json["owner_id"],
                )
            ),
        )
        .when(
            method == "mint",
            F.array(
                _leg(
                    args_json["account_id"],
                    amount,
                    "mint",
                    receiver,  # token contract credits (:191)
                    args_json["account_id"],
                )
            ),
        )
        .when(
            method == "withdraw",
            F.array(
                _leg(
                    predecessor,
                    -amount.try_cast(AMOUNT_TYPE),
                    "withdraw",
                    predecessor,
                    args_json["recipient"],
                    raw_amount=amount,
                )
            ),
        )
        .when(
            method == "ft_transfer",
            F.array(
                _leg(
                    predecessor,
                    -amount.try_cast(AMOUNT_TYPE),
                    "ft_transfer_from",
                    predecessor,
                    args_json["receiver_id"],
                    raw_amount=amount,
                ),
                _leg(
                    args_json["receiver_id"],
                    amount,
                    "ft_transfer_to",
                    predecessor,
                    args_json["receiver_id"],
                ),
            ),
        )
        .when(
            method == "ft_resolve_transfer",
            F.array(
                _leg(
                    args_json["sender_id"],
                    -amount.try_cast(AMOUNT_TYPE),
                    "ft_resolve_transfer_from",
                    args_json["sender_id"],
                    args_json["receiver_id"],
                    raw_amount=amount,
                ),
                _leg(
                    args_json["receiver_id"],
                    amount,
                    "ft_resolve_transfer_to",
                    args_json["sender_id"],
                    args_json["receiver_id"],
                ),
            ),
        )
        # unknown method / ft_transfer_call: emit nothing (:156, :222-238)
        .otherwise(F.array().cast(f"array<{_leg_ddl()}>"))
    )


def _leg_ddl() -> str:
    return (
        "struct<affected_account:string,affected_amount:decimal(38,0),"
        "affected_reason:string,transfer_from:string,transfer_to:string,"
        "_raw_amount:string>"
    )


def extract_transfers(
    joined: DataFrame, token_address: str, observation=None
) -> DataFrame:
    """Filter P1 + flat-map U1 over the flat joined row.

    Input: output of ``join_receipts_outcomes_actions`` (flat row with
    receipt/outcome/action columns).  Output: token_transfer rows
    (TOKEN_TRANSFER_SCHEMA column order).
    """
    filtered = joined.where(
        (F.col("receiver_account_id") == F.lit(token_address))
        & (F.col("status") != "FAILURE")
        & (F.col("action_kind") == "FUNCTION_CALL")
    )

    parsed = filtered.withColumn("_args", F.from_json(F.col("args"), ARGS_JSON_SCHEMA))
    legs = parsed.withColumn(
        "_legs",
        transfer_legs_expr(
            F.col("_args.method_name"),
            F.col("_args.args_json"),
            F.col("predecessor_account_id"),
            F.col("receiver_account_id"),
        ),
    )
    exploded = legs.select(*_PASSTHROUGH, F.explode("_legs").alias("_leg"))
    # overflow/loss observability: the drop filter below silently loses
    # ledger entries otherwise -- count total legs, dropped legs, and
    # specifically legs whose raw amount string WAS numeric but exceeded
    # the decimal(38,0) engine cap (the reference holds decimal(45,0))
    dropped = F.col("_leg.affected_amount").isNull() | F.col(
        "_leg.affected_account"
    ).isNull()
    overflow = F.col("_leg.affected_amount").isNull() & F.col(
        "_leg._raw_amount"
    ).rlike(r"^-?[0-9]{39,}$")
    exploded = exploded.observe(
        observation if observation is not None else "transfer_legs",
        # exploded = every flat-mapped leg BEFORE the drop filter;
        # legs actually emitted downstream = exploded - dropped
        F.count(F.lit(1)).alias("exploded_legs"),
        F.sum(dropped.cast("long")).alias("dropped_legs"),
        F.sum(overflow.cast("long")).alias("overflow_dropped_legs"),
    )
    return (
        exploded.select(
            *_PASSTHROUGH, *[F.col(f"_leg.{f}").alias(f) for f in _LEG_FIELDS]
        )
        # malformed-but-parseable args (missing amount/account fields) must
        # not emit legs; the reference NPEs on these -- dropping is the
        # fault-tolerant equivalent (a null amount would poison sum());
        # the observation above makes the loss visible, incl. >38-digit
        # overflow (use functions/bigint.py exact mode if those occur)
        .where(
            F.col("affected_amount").isNotNull()
            & F.col("affected_account").isNotNull()
        )
        .select(*[f.name for f in TOKEN_TRANSFER_SCHEMA.fields])
    )
