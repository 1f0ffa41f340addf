"""Handcrafted NEAR-shaped fixtures per FIXTURES.md.

Covers every method_name branch and all nine adversarial cases
(FIXTURES.md "Adversarial fixture cases").  Amount magnitudes up to
~1e33 exercise the decimal(38,0) path.
"""

from __future__ import annotations

import json
from decimal import Decimal

TOKEN = "oct.beta_oct_relay.testnet"

# base block time: 2021-08-12 02:32:38.947945772 UTC in epoch ns
T0 = 1628737958947945772
SEC = 1_000_000_000


def _args(method: str, args_json: dict) -> str:
    return json.dumps(
        {
            "gas": 100000000000000,
            "deposit": "0",
            "method_name": method,
            "args_json": args_json,
            "args_base64": "",
        }
    )


def _receipt(rid, ts, predecessor, receiver=TOKEN, idx=0, kind="ACTION"):
    return {
        "receipt_id": rid,
        "included_in_block_hash": f"block-{rid}",
        "included_in_chunk_hash": f"chunk-{rid}",
        "index_in_chunk": idx,
        "included_in_block_timestamp": Decimal(ts),
        "predecessor_account_id": predecessor,
        "receiver_account_id": receiver,
        "receipt_kind": kind,
        "originated_from_transaction_hash": f"tx-{rid}",
        "__deleted": None,
    }


def _outcome(rid, ts, status="SUCCESS_VALUE", idx=0):
    return {
        "receipt_id": rid,
        "executed_in_block_hash": f"eblock-{rid}",
        "executed_in_block_timestamp": Decimal(ts),
        "index_in_chunk": idx,
        "gas_burnt": Decimal(3 * 10**12),
        "tokens_burnt": Decimal(3 * 10**20),
        "executor_account_id": TOKEN,
        "status": status,
        "shard_id": Decimal(1),
        "__deleted": None,
    }


def _action(rid, args, idx=0, kind="FUNCTION_CALL", predecessor="caller.near",
            receiver=TOKEN, ts=T0):
    return {
        "receipt_id": rid,
        "index_in_action_receipt": idx,
        "action_kind": kind,
        "args": args,
        "receipt_predecessor_account_id": predecessor,
        "receipt_receiver_account_id": receiver,
        "receipt_included_in_block_timestamp": Decimal(ts),
        "__deleted": None,
    }


def build_fixture():
    """Returns (receipts, outcomes, actions, expected) where expected maps
    account -> final balance (Decimal) plus expected transfer-row count."""
    receipts, outcomes, actions = [], [], []

    # r1: new -- owner madtest gets total_supply 1e32 (README example)
    receipts.append(_receipt("r1", T0, "deployer.near"))
    outcomes.append(_outcome("r1", T0 + SEC))
    actions.append(
        _action(
            "r1",
            _args(
                "new",
                {
                    "owner_id": "madtest.testnet",
                    "total_supply": "100000000000000000000000000000000",
                    "metadata": {"symbol": "OCT", "decimals": 24},
                },
            ),
            predecessor="deployer.near",
            ts=T0,
        )
    )

    # r2: mint 5e24 to alice
    receipts.append(_receipt("r2", T0 + 10 * SEC, "bridge.near", idx=1))
    outcomes.append(_outcome("r2", T0 + 11 * SEC))
    actions.append(
        _action(
            "r2",
            _args("mint", {"account_id": "alice.near", "amount": "5000000000000000000000000"}),
            predecessor="bridge.near",
            ts=T0 + 10 * SEC,
        )
    )

    # r3: ft_transfer alice -> bob 2e24 (2 legs)
    receipts.append(_receipt("r3", T0 + 20 * SEC, "alice.near", idx=2))
    outcomes.append(_outcome("r3", T0 + 21 * SEC))
    actions.append(
        _action(
            "r3",
            _args("ft_transfer", {"receiver_id": "bob.near", "amount": "2000000000000000000000000"}),
            predecessor="alice.near",
            ts=T0 + 20 * SEC,
        )
    )

    # r4: withdraw 1e24 by bob to eth addr (1 leg, negative)
    receipts.append(_receipt("r4", T0 + 30 * SEC, "bob.near", idx=3))
    outcomes.append(_outcome("r4", T0 + 31 * SEC))
    actions.append(
        _action(
            "r4",
            _args("withdraw", {"amount": "1000000000000000000000000", "recipient": "0xdead"}),
            predecessor="bob.near",
            ts=T0 + 30 * SEC,
        )
    )

    # r5: ft_resolve_transfer carol -> dave 3e23 (2 legs)
    receipts.append(_receipt("r5", T0 + 40 * SEC, "skyward.near", idx=4))
    outcomes.append(_outcome("r5", T0 + 41 * SEC))
    actions.append(
        _action(
            "r5",
            _args(
                "ft_resolve_transfer",
                {"sender_id": "carol.near", "receiver_id": "dave.near",
                 "amount": "300000000000000000000000"},
            ),
            predecessor="skyward.near",
            ts=T0 + 40 * SEC,
        )
    )

    # --- adversarial cases ---
    # (1) exact duplicate of r3's rows (CDC at-least-once) -> no effect
    receipts.append(dict(receipts[2]))
    outcomes.append(dict(outcomes[2]))
    actions.append(dict(actions[2]))

    # (2) FAILURE outcome on an otherwise-valid ft_transfer -> no rows
    receipts.append(_receipt("r6", T0 + 50 * SEC, "alice.near", idx=5))
    outcomes.append(_outcome("r6", T0 + 51 * SEC, status="FAILURE"))
    actions.append(
        _action("r6", _args("ft_transfer", {"receiver_id": "bob.near", "amount": "999"}),
                predecessor="alice.near", ts=T0 + 50 * SEC)
    )

    # (3) non-token receiver -> no rows
    receipts.append(_receipt("r7", T0 + 60 * SEC, "alice.near",
                             receiver="other.token.near", idx=6))
    outcomes.append(_outcome("r7", T0 + 61 * SEC))
    actions.append(
        _action("r7", _args("ft_transfer", {"receiver_id": "bob.near", "amount": "888"}),
                predecessor="alice.near", receiver="other.token.near", ts=T0 + 60 * SEC)
    )

    # (4) join-window miss: outcome 10s after receipt -> no joined row
    receipts.append(_receipt("r8", T0 + 70 * SEC, "alice.near", idx=7))
    outcomes.append(_outcome("r8", T0 + 80 * SEC))
    actions.append(
        _action("r8", _args("ft_transfer", {"receiver_id": "bob.near", "amount": "777"}),
                predecessor="alice.near", ts=T0 + 70 * SEC)
    )

    # (5) ordering tie: two mints to eve at the SAME block ts, different
    # index_in_chunk -- metadata must come from idx 9 (higher)
    receipts.append(_receipt("r9", T0 + 90 * SEC, "bridge.near", idx=8))
    outcomes.append(_outcome("r9", T0 + 90 * SEC))
    actions.append(
        _action("r9", _args("mint", {"account_id": "eve.near", "amount": "100"}),
                predecessor="bridge.near", ts=T0 + 90 * SEC)
    )
    receipts.append(_receipt("r10", T0 + 90 * SEC, "bridge.near", idx=9))
    outcomes.append(_outcome("r10", T0 + 90 * SEC))
    actions.append(
        _action("r10", _args("mint", {"account_id": "eve.near", "amount": "200"}),
                predecessor="bridge.near", ts=T0 + 90 * SEC)
    )

    # (7) multi-action receipt: two FUNCTION_CALL actions on one receipt
    receipts.append(_receipt("r11", T0 + 100 * SEC, "bridge.near", idx=10))
    outcomes.append(_outcome("r11", T0 + 101 * SEC))
    actions.append(
        _action("r11", _args("mint", {"account_id": "frank.near", "amount": "10"}),
                idx=0, predecessor="bridge.near", ts=T0 + 100 * SEC)
    )
    actions.append(
        _action("r11", _args("mint", {"account_id": "frank.near", "amount": "20"}),
                idx=1, predecessor="bridge.near", ts=T0 + 100 * SEC)
    )

    # (8) unknown method_name -> no rows
    receipts.append(_receipt("r12", T0 + 110 * SEC, "alice.near", idx=11))
    outcomes.append(_outcome("r12", T0 + 111 * SEC))
    actions.append(
        _action("r12", _args("ft_balance_of", {"account_id": "alice.near"}),
                predecessor="alice.near", ts=T0 + 110 * SEC)
    )

    # ft_transfer_call: handler commented out in reference -> no rows
    receipts.append(_receipt("r13", T0 + 120 * SEC, "alice.near", idx=12))
    outcomes.append(_outcome("r13", T0 + 121 * SEC))
    actions.append(
        _action("r13", _args("ft_transfer_call",
                             {"receiver_id": "bob.near", "amount": "666", "msg": ""}),
                predecessor="alice.near", ts=T0 + 120 * SEC)
    )

    # (9) self-transfer: grace -> grace nets to 0
    receipts.append(_receipt("r14", T0 + 130 * SEC, "grace.near", idx=13))
    outcomes.append(_outcome("r14", T0 + 131 * SEC))
    actions.append(
        _action("r14", _args("ft_transfer", {"receiver_id": "grace.near", "amount": "50"}),
                predecessor="grace.near", ts=T0 + 130 * SEC)
    )

    # non-FUNCTION_CALL action kind -> filtered
    receipts.append(_receipt("r15", T0 + 140 * SEC, "alice.near", idx=14))
    outcomes.append(_outcome("r15", T0 + 141 * SEC))
    actions.append(
        _action("r15", _args("ft_transfer", {"receiver_id": "bob.near", "amount": "555"}),
                kind="TRANSFER", predecessor="alice.near", ts=T0 + 140 * SEC)
    )

    expected_balances = {
        "madtest.testnet": Decimal("100000000000000000000000000000000"),
        "alice.near": Decimal("3000000000000000000000000"),   # +5e24 -2e24
        "bob.near": Decimal("1000000000000000000000000"),     # +2e24 -1e24
        "carol.near": Decimal("-300000000000000000000000"),
        "dave.near": Decimal("300000000000000000000000"),
        "eve.near": Decimal("300"),
        "frank.near": Decimal("30"),
        "grace.near": Decimal("0"),
    }
    # legs: r1=1, r2=1, r3=2, r4=1, r5=2, r9=1, r10=1, r11=2, r14=2
    expected_transfer_rows = 13
    # (5) tie-break: eve metadata from receipt r10 (same ts, idx 9 > 8)
    expected_eve_meta_receipt = "r10"
    return (
        receipts,
        outcomes,
        actions,
        {
            "balances": expected_balances,
            "transfer_rows": expected_transfer_rows,
            "eve_meta_receipt": expected_eve_meta_receipt,
        },
    )


def to_dataframes(spark):
    from nearscan_kafka_streams_spark.schemas import (
        ACTION_RECEIPT_ACTIONS_SCHEMA,
        EXECUTION_OUTCOMES_SCHEMA,
        RECEIPTS_SCHEMA,
    )

    receipts, outcomes, actions, expected = build_fixture()
    r = spark.createDataFrame(receipts, RECEIPTS_SCHEMA)
    o = spark.createDataFrame(outcomes, EXECUTION_OUTCOMES_SCHEMA)
    a = spark.createDataFrame(actions, ACTION_RECEIPT_ACTIONS_SCHEMA)
    return r, o, a, expected
