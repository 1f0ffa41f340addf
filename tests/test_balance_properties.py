"""Property-based balance invariants (SURVEY (S)5.5, hypothesis).

For any set of transfer legs:
- per-account balance == signed sum of that account's legs
  (order-insensitive by construction, A1);
- sum of all balances == sum of all leg amounts;
- metadata comes from the max (block_timestamp, index_in_chunk) leg.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nearscan_kafka_streams_spark.operators.balance import token_balances
from nearscan_kafka_streams_spark.schemas import TOKEN_TRANSFER_SCHEMA

ACCOUNTS = ["a.near", "b.near", "c.near"]

leg = st.fixed_dictionaries(
    {
        "account": st.sampled_from(ACCOUNTS),
        "amount": st.integers(min_value=-(10**30), max_value=10**30),
        "ts": st.integers(min_value=0, max_value=10**6),
        "idx": st.integers(min_value=0, max_value=50),
    }
)


def _transfer_row(i: int, leg_dict: dict) -> dict:
    return {
        "receipt_id": f"r{i}",
        "included_in_block_hash": f"bh{i}",
        "included_in_chunk_hash": f"ch{i}",
        "index_in_chunk": leg_dict["idx"],
        "included_in_block_timestamp": Decimal(leg_dict["ts"]),
        "predecessor_account_id": "p.near",
        "receiver_account_id": "token.near",
        "originated_from_transaction_hash": f"tx{i}",
        "gas_burnt": Decimal(1),
        "tokens_burnt": Decimal(1),
        "executor_account_id": "e.near",
        "status": "SUCCESS_VALUE",
        "shard_id": Decimal(0),
        "index_in_action_receipt": 0,
        "action_kind": "FUNCTION_CALL",
        "args": "{}",
        "affected_account": leg_dict["account"],
        "affected_amount": Decimal(leg_dict["amount"]),
        "affected_reason": "mint",
        "transfer_from": "x.near",
        "transfer_to": leg_dict["account"],
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(legs=st.lists(leg, min_size=1, max_size=30))
def test_balance_invariants(spark, legs):
    rows = [_transfer_row(i, d) for i, d in enumerate(legs)]
    df = spark.createDataFrame(rows, TOKEN_TRANSFER_SCHEMA)
    got = {r["account"]: r for r in token_balances(df).collect()}

    expected_sums: dict[str, int] = {}
    for d in legs:
        expected_sums[d["account"]] = expected_sums.get(d["account"], 0) + d["amount"]

    assert set(got) == set(expected_sums)
    for acct, total in expected_sums.items():
        assert got[acct]["balance"] == Decimal(total)

    # global conservation (int arithmetic: Python's default Decimal
    # context would round the test's own 28+-digit sums)
    assert sum(int(r["balance"]) for r in got.values()) == sum(
        d["amount"] for d in legs
    )

    # latest metadata: max (ts, idx); among several legs sharing the max
    # ordering key the winner's metadata is deterministic (max_by), and
    # its (ts, idx) equals the max key
    for acct in expected_sums:
        acct_legs = [d for d in legs if d["account"] == acct]
        max_key = max((d["ts"], d["idx"]) for d in acct_legs)
        assert (
            int(got[acct]["block_timestamp"]),
            got[acct]["index_in_chunk"],
        ) == max_key
