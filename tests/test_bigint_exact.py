"""Exact-mode balance aggregation: arbitrary precision beyond
decimal(38,0) (SURVEY (S)7.4.1 optional exact mode)."""

from __future__ import annotations

from nearscan_kafka_streams_spark.functions.bigint import token_balances_exact
from nearscan_kafka_streams_spark.operators.balance import token_balances
from nearscan_kafka_streams_spark.schemas import TOKEN_TRANSFER_SCHEMA
from tests.test_balance_properties import _transfer_row


def _df(spark, legs):
    rows = [_transfer_row(i, d) for i, d in enumerate(legs)]
    return spark.createDataFrame(rows, TOKEN_TRANSFER_SCHEMA)


def test_exact_matches_decimal_mode_in_range(spark):
    legs = [
        {"account": "a.near", "amount": 10**33, "ts": 5, "idx": 1},
        {"account": "a.near", "amount": -(10**32), "ts": 9, "idx": 2},
        {"account": "b.near", "amount": 7, "ts": 1, "idx": 0},
    ]
    df = _df(spark, legs)
    dec = {r["account"]: r for r in token_balances(df).collect()}
    exact = {r["account"]: r for r in token_balances_exact(df).collect()}
    assert set(dec) == set(exact)
    for acct in dec:
        assert str(dec[acct]["balance"]) == exact[acct]["balance"]
        assert dec[acct]["receipt_id"] == exact[acct]["receipt_id"]


def test_exact_mode_beyond_38_digits(spark):
    """45-digit amounts (the reference's declared decimal(45,0) domain):
    string-carried transfers aggregate exactly."""
    from pyspark.sql import functions as F

    big = 10**44  # 45 digits -- over DecimalType's cap
    legs = [
        {"account": "w.near", "amount": 1, "ts": 1, "idx": 0},
        {"account": "w.near", "amount": 2, "ts": 2, "idx": 0},
    ]
    df = _df(spark, legs)
    # exact wire mode: amounts as strings (cannot exist as decimal(38,0))
    df = df.withColumn(
        "affected_amount",
        F.when(F.col("receipt_id") == "r0", F.lit(str(big)))
        .otherwise(F.lit(str(big + 1))),
    )
    out = token_balances_exact(df).collect()[0]
    assert out["balance"] == str(2 * big + 1)
    assert out["receipt_id"] == "r1"  # latest by ts
