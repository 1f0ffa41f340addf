"""Corpus language-model perplexity scoring (CCNet-style quality gate).

CCNet (arXiv:1911.00359) and most production curation stacks rank web
documents by the perplexity of a small LM trained on a trusted corpus:
low-perplexity text reads like the reference distribution, high
perplexity flags boilerplate/gibberish.  The distributable skeleton is
a smoothed unigram model -- token-count aggregation plus a per-token
log-probability join -- which this module implements exactly; a real
KenLM swaps into the same plan as a broadcast scorer.

Exactness device: each token's log-probability is quantized to integer
micro-nats (``round(ln(p) * 1e6)`` as BIGINT) *before* the per-document
sum, so the aggregate is order-independent integer addition and the
oracle hash gate never sees float summation drift.  The probabilities
themselves are exact rationals ``(c + 1) / (N + V)`` (add-one
smoothing) evaluated identically by both engines.

Scale shapes: the model is one groupBy over the exploded token stream
(map-side combined); scoring re-joins tokens to the model on the token
key -- a shuffle proportional to corpus token count, the irreducible
cost -- then one partial-aggregated per-doc sum.  The model table
(vocabulary-sized) broadcasts when it fits; Catalyst/AQE picks that
automatically below the broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# whitespace tokenization, shared with token_count/vocab_topk so every
# text op agrees on what a "token" is (and the DuckDB oracle can
# reproduce it with string_split_regex('\s+'))
_WS = r"\s+"


def unigram_logprob_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Train the smoothed unigram model: (token, lp_micro) with
    ``lp_micro = round(ln((c + 1) / (N + V)) * 1e6)`` -- integer
    micro-nats per token."""
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), _WS),
                lambda w: w != "",
            )
        ).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("N"), F.count(F.lit(1)).alias("V")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.round(
            F.log((F.col("c") + 1) / (F.col("N") + F.col("V")).cast("double"))
            * 1_000_000
        )
        .cast("bigint")
        .alias("lp_micro"),
    )


def perplexity_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against the corpus-trained unigram model:
    (id, tokens, avg_nll_micro) where ``avg_nll_micro`` is the mean
    negative log-probability in integer micro-nats (lower == more
    typical).  Documents with zero tokens drop (no distribution to
    score against)."""
    model = unigram_logprob_model(docs, text_col)
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), _WS),
                lambda w: w != "",
            )
        ).alias("tok"),
    )
    scored = toks.join(model, "tok").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("tokens"),
        F.sum("lp_micro").alias("lp_sum"),
    )
    # integer micro-nats end-to-end: `div` truncates toward zero in
    # both Spark and DuckDB, and a float `round(x, 6)` here would hit
    # the engines' decimal-vs-binary half-boundary divergence (Spark
    # rounds the shortest decimal repr HALF_UP; DuckDB rounds the
    # binary double) whenever lp_sum/tokens lands on .5 micro-nats
    return scored.select(
        id_col,
        "tokens",
        F.expr("-(lp_sum div tokens)").cast("bigint").alias("avg_nll_micro"),
    )
