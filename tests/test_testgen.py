"""Generated NEAR-shaped data: determinism + pipeline invariants at
a size the handcrafted fixtures cannot reach."""

from __future__ import annotations

from nearscan_kafka_streams_spark.pipeline import run_batch
from nearscan_kafka_streams_spark.testgen import generate_near_tables


def test_generator_deterministic(spark):
    r1, _, _ = generate_near_tables(spark, 2000)
    r2, _, _ = generate_near_tables(spark, 2000)
    assert r1.exceptAll(r2).count() == 0
    assert r2.exceptAll(r1).count() == 0


def test_pipeline_on_generated_data(spark):
    r, o, a = generate_near_tables(spark, 5000)
    out = run_batch(r, o, a)
    transfers = out.transfers
    n = transfers.count()
    assert n > 0
    # only token-targeted, non-FAILURE, known-method rows emit legs
    assert transfers.where("receiver_account_id NOT LIKE 'oct%'").count() == 0
    assert transfers.where("status = 'FAILURE'").count() == 0
    # ft_transfer/ft_resolve emit 2 legs; mint/withdraw 1 -> legs bounded
    per_receipt = transfers.groupBy("receipt_id").count()
    assert per_receipt.where("count > 2").count() == 0
    # duplicates must not inflate: leg count per receipt+reason is unique
    dup_legs = (
        transfers.groupBy("receipt_id", "affected_reason").count().where("count > 1")
    )
    assert dup_legs.count() == 0
    # conservation: ft_transfer/ft_resolve legs net to zero, so total
    # balance == sum of mint legs - withdraw legs
    from pyspark.sql import functions as F

    total = out.balances.agg(F.sum("balance")).collect()[0][0]
    mints = transfers.where("affected_reason = 'mint'").agg(
        F.sum("affected_amount")
    ).collect()[0][0]
    withdraws = transfers.where("affected_reason = 'withdraw'").agg(
        F.sum("affected_amount")
    ).collect()[0][0]
    assert total == (mints or 0) + (withdraws or 0)