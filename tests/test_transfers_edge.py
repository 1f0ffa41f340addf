"""Edge-case tests for transfer extraction (malformed args)."""

from __future__ import annotations

import json

from nearscan_kafka_streams_spark.pipeline import run_batch
from tests.fixtures_near import to_dataframes


def _with_args(spark, a, receipt_id, new_args):
    rows = [r.asDict() for r in a.collect()]
    for r in rows:
        if r["receipt_id"] == receipt_id:
            r["args"] = new_args
    return spark.createDataFrame(rows, a.schema)


def test_malformed_json_emits_nothing(spark):
    r, o, a, _ = to_dataframes(spark)
    a2 = _with_args(spark, a, "r1", "{not valid json")
    out = run_batch(r, o, a2)
    assert out.transfers.where("receipt_id = 'r1'").count() == 0


def test_missing_amount_field_emits_nothing(spark):
    r, o, a, _ = to_dataframes(spark)
    a2 = _with_args(
        spark, a, "r2",
        json.dumps({"method_name": "mint", "args_json": {"account_id": "x.near"}}),
    )
    out = run_batch(r, o, a2)
    assert out.transfers.where("receipt_id = 'r2'").count() == 0


def test_missing_account_field_emits_nothing(spark):
    r, o, a, _ = to_dataframes(spark)
    a2 = _with_args(
        spark, a, "r2",
        json.dumps({"method_name": "mint", "args_json": {"amount": "123"}}),
    )
    out = run_batch(r, o, a2)
    assert out.transfers.where("receipt_id = 'r2'").count() == 0


def test_non_numeric_amount_emits_nothing(spark):
    r, o, a, _ = to_dataframes(spark)
    a2 = _with_args(
        spark, a, "r2",
        json.dumps({"method_name": "mint",
                    "args_json": {"account_id": "x.near", "amount": "not-a-number"}}),
    )
    out = run_batch(r, o, a2)
    # cast('not-a-number' as decimal) -> null -> leg dropped
    assert out.transfers.where("receipt_id = 'r2'").count() == 0


def test_overflow_amount_dropped_but_observed(spark):
    """ADVICE r1: a numeric amount wider than decimal(38,0) (reference
    declares 45,0) is dropped by the cast -- the observation must count
    it so the loss is detectable, distinct from malformed-args drops."""
    from pyspark.sql import Observation

    from nearscan_kafka_streams_spark.operators.dedup import dedup_batch
    from nearscan_kafka_streams_spark.operators.joins import (
        join_receipts_outcomes_actions,
    )
    from nearscan_kafka_streams_spark.operators.transfers import extract_transfers

    r, o, a, _ = to_dataframes(spark)
    a2 = _with_args(
        spark, a, "r2",
        json.dumps({"method_name": "mint",
                    "args_json": {"account_id": "x.near",
                                  "amount": "9" * 45}}),  # 45 digits
    )
    joined = join_receipts_outcomes_actions(
        dedup_batch(r, ["receipt_id"]),
        dedup_batch(o, ["receipt_id"]),
        dedup_batch(a2, ["receipt_id", "index_in_action_receipt"]),
    )
    obs = Observation("transfer_legs")
    transfers = extract_transfers(
        joined, "oct.beta_oct_relay.testnet", observation=obs
    )
    assert transfers.where("receipt_id = 'r2'").count() == 0  # dropped
    m = obs.get
    assert m["overflow_dropped_legs"] == 1
    assert m["dropped_legs"] >= 1
    assert m["exploded_legs"] > m["dropped_legs"]


def test_ft_transfer_call_emits_zero_legs_reference_parity(spark):
    """ft_transfer_call -> ZERO legs, by reference parity: the
    reference's handler is COMMENTED OUT (TokenBalance.java:222-238),
    so a well-formed, successful ft_transfer_call to the token
    contract must contribute no transfer rows and no balance effect.

    The control leg proves the zero comes from the method dispatch
    (transfer_legs_expr's otherwise-empty CASE arm), not an upstream
    filter: the SAME receipt with method_name swapped to ft_transfer
    and identical args emits the usual 2 legs (r10 verdict item 7)."""
    r, o, a, _ = to_dataframes(spark)
    call_args = {"receiver_id": "bob.near", "amount": "777", "msg": ""}
    a2 = _with_args(
        spark, a, "r2",
        json.dumps({"method_name": "ft_transfer_call",
                    "args_json": call_args}),
    )
    out = run_batch(r, o, a2)
    assert out.transfers.where("receipt_id = 'r2'").count() == 0
    # control: identical receipt/outcome/args, handled method -> 2 legs
    a3 = _with_args(
        spark, a, "r2",
        json.dumps({"method_name": "ft_transfer", "args_json": call_args}),
    )
    out2 = run_batch(r, o, a3)
    assert out2.transfers.where("receipt_id = 'r2'").count() == 2
