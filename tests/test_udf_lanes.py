"""The three Python execution lanes, pinned side by side.

When Python is unavoidable, the engine's order of preference is
(1) built-in column expressions (not Python at all — every hot path
here), (2) Arrow-batched: pandas_udf or arrow-optimized scalar udf,
(3) row-at-a-time pickled UDFs — never used in this repo's hot paths.
This test pins that the Arrow lanes actually PLAN as ArrowEvalPython
(not BatchEvalPython), that all lanes agree numerically, and keeps a
living example of each API."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_arrow_lanes_agree_and_plan_as_arrow(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("x")
    )

    @pandas_udf("double")
    def squash_pandas(x: pd.Series) -> pd.Series:
        return x / (1.0 + x.abs())

    @udf(returnType="double", useArrow=True)
    def squash_arrow(x):
        return x / (1.0 + abs(x))

    builtin = df.select("id", (F.col("x") / (1.0 + F.abs("x"))).alias("y"))
    via_pandas = df.select("id", squash_pandas("x").alias("y"))
    via_arrow = df.select("id", squash_arrow("x").alias("y"))

    b = {r["id"]: r["y"] for r in builtin.collect()}
    p = {r["id"]: r["y"] for r in via_pandas.collect()}
    a = {r["id"]: r["y"] for r in via_arrow.collect()}
    assert b == p == a  # same IEEE ops -> bit-equal

    assert "ArrowEvalPython" in _plan(via_pandas)
    assert "ArrowEvalPython" in _plan(via_arrow)
    # the built-in lane never leaves the JVM
    assert "EvalPython" not in _plan(builtin)


def test_row_at_a_time_lane_is_visible_in_plan(spark):
    """A pickled row-at-a-time UDF plans as BatchEvalPython -- the node
    the plan-audit greps for and this repo's hot paths must not show."""
    df = spark.range(100).select(F.col("id").cast("double").alias("x"))

    @udf(returnType="double")  # no Arrow: the slow lane
    def slow(x):
        return x + 1.0

    plan = _plan(df.select(slow("x")))
    assert "BatchEvalPython" in plan
