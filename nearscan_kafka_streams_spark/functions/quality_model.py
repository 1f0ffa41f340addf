"""Model-based quality scoring: hashed bag-of-words linear classifier.

Production curation pipelines gate documents with a trained quality
classifier (fastText-style linear model over hashed token features --
the CCNet / GPT-3 / Llama data recipes).  The model WEIGHTS here are
deterministic pseudo-random stand-ins (no training corpus ships with
this repo); the distributed SCORING path is the real one:

* feature hashing: token -> md5 -> first 8 hex digits -> int mod D
  (the hashing-trick; D bounds the model size regardless of vocab);
* the D-dimensional weight vector rides into the plan as ONE array
  literal inside whole-stage codegen (for big D, a broadcast join on
  the feature id replaces it) -- scoring is a narrow per-row pass, no
  shuffle, no UDF;
* weights are QUANTIZED to integer millionths: the per-doc feature sum
  is then an exact integer in any summation order, so a DuckDB oracle
  reproduces the margin bit-for-bit (a double sum differs between
  engines by summation order at the rounding boundary).

``margin`` (bias + mean feature weight) is the linear output; apply
``sigmoid`` downstream if a probability is wanted -- kept out of the
compared columns because libm/JVM ``exp`` differ in the last ulp.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

_WS = r"\s+"


def make_weights(d: int = 1024, seed: int = 7) -> list[int]:
    """Deterministic weight vector in integer millionths of [-1, 1)."""
    rng = np.random.default_rng(seed)
    return [int(round(float(x) * 1_000_000)) for x in rng.uniform(-1, 1, d)]


def feature_index(token: F.Column, d: int) -> F.Column:
    """Hashing trick: md5 -> first 8 hex digits -> int in [0, d)."""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long") % d


def quality_margin_cols(
    text: F.Column, weights: list[int], bias_millionths: int = 100_000
) -> dict[str, F.Column]:
    """Columns for the linear quality model over one text column.

    Returns ``n_tokens`` (int), ``weight_sum_x1e6`` (exact integer
    feature sum), ``margin`` (double, bias + mean weight), ``kept``
    (margin >= 0) -- margin/kept derive from integers, so they are
    engine-exact.
    """
    d = len(weights)
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.trim(text)), _WS, " "), " "),
        lambda t: t != "",
    )
    wlit = F.array(*[F.lit(int(w)) for w in weights]).cast("array<long>")
    wsum = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.element_at(wlit, (feature_index(t, d) + 1).cast("int")),
    )
    n = F.size(toks)
    # kept <=> bias + wsum/(1e6 * n) >= 0 <=> bias_ppm * n + wsum >= 0
    # (n > 0; empty docs fall back to the bias sign) -- integer compare
    kept = F.when(
        n == 0, F.lit(bias_millionths >= 0)
    ).otherwise(F.lit(bias_millionths) * n + wsum >= 0)
    margin = F.when(n == 0, F.lit(bias_millionths / 1e6)).otherwise(
        F.lit(bias_millionths / 1e6) + (wsum / 1e6) / n
    )
    return {
        "n_tokens": n,
        "weight_sum_x1e6": wsum,
        "margin": F.round(margin, 6),
        "kept": kept,
    }


def quality_model_sql(
    weights: list[int],
    bias_millionths: int = 100_000,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle reproducing :func:`quality_margin_cols` exactly."""
    d = len(weights)
    wlist = "[" + ", ".join(str(int(w)) for w in weights) + "]"
    return f"""
WITH t AS (
  SELECT {id_col},
         list_filter(string_split(
           regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g'), ' '),
           x -> x <> '') AS toks
  FROM {table}
),
s AS (
  SELECT {id_col}, len(toks) AS n_tokens,
         CAST(coalesce(list_sum(
           [{wlist}[(('0x' || substring(md5(tok), 1, 8))::BIGINT % {d}) + 1]
            for tok in toks]), 0) AS BIGINT) AS weight_sum_x1e6
  FROM t
)
SELECT {id_col}, CAST(n_tokens AS INT) AS n_tokens, weight_sum_x1e6,
       round(CASE WHEN n_tokens = 0 THEN {bias_millionths} / 1e6
             ELSE {bias_millionths} / 1e6
                  + (weight_sum_x1e6 / 1e6) / n_tokens END, 6) AS margin,
       CASE WHEN n_tokens = 0 THEN {bias_millionths >= 0}
            ELSE {bias_millionths} * n_tokens + weight_sum_x1e6 >= 0
       END AS kept
FROM s
"""
