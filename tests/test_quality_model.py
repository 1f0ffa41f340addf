"""Hashed-feature linear quality model (functions/quality_model.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.functions.quality_model import (
    make_weights,
    quality_margin_cols,
)


def _score(spark, rows, weights, bias=100_000):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cols = quality_margin_cols(F.col("text"), weights, bias)
    return {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            cols["n_tokens"].alias("n_tokens"),
            cols["weight_sum_x1e6"].alias("ws"),
            cols["margin"].alias("margin"),
            cols["kept"].alias("kept"),
        ).collect()
    }


def _idx(token: str, d: int) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % d


def test_matches_python_reference():
    weights = make_weights(64, seed=3)
    for tok in ["hello", "world", "x1"]:
        i = _idx(tok, 64)
        assert 0 <= i < 64 and isinstance(weights[i], int)


def test_scoring_semantics(spark):
    weights = make_weights(64, seed=3)
    rows = [(1, "hello world"), (2, ""), (3, "   "), (4, "Hello  HELLO")]
    out = _score(spark, rows, weights)

    exp1 = weights[_idx("hello", 64)] + weights[_idx("world", 64)]
    assert out[1]["ws"] == exp1 and out[1]["n_tokens"] == 2
    assert abs(out[1]["margin"] - round(0.1 + (exp1 / 1e6) / 2, 6)) < 1e-9
    assert out[1]["kept"] == (100_000 * 2 + exp1 >= 0)

    # empty / blank docs: bias-only
    for d in (2, 3):
        assert out[d]["n_tokens"] == 0 and out[d]["ws"] == 0
        assert out[d]["margin"] == 0.1 and out[d]["kept"] is True

    # case folding: both tokens hash to 'hello'
    assert out[4]["ws"] == 2 * weights[_idx("hello", 64)]


def test_negative_bias_gates(spark):
    weights = [0] * 16  # all-zero weights -> sign(bias) decides
    out = _score(spark, [(1, "a b c"), (2, "")], weights, bias=-5)
    assert out[1]["kept"] is False and out[2]["kept"] is False
