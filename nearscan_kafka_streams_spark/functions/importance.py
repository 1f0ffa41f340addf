"""DSIR-flavored data-selection importance reweighting.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) scores every candidate document by how much its
hashed-n-gram distribution looks like a small TARGET corpus relative
to the RAW corpus, then samples proportionally to that importance
weight.  This module implements the scoring half with integer
arithmetic end-to-end so the result is bit-identical across engines
(log-probability variants depend on libm; Laplace-smoothed integer
ratios do not):

    bucket(w)  = int(md5(w)[:6], 16) % n_buckets
    weight(b)  = ((target_count(b) + 1) * SCALE) div (corpus_count(b)
                 + n_buckets)
    score(doc) = sum over token occurrences of weight(bucket(token))

Scale shape: both count passes are one groupBy over an exploded token
stream (map-side partial aggregation); the weight table is at most
``n_buckets`` rows, so the score join back onto the token stream is a
BROADCAST map-side join -- the corpus shuffles once (the per-doc sum),
never on the raw tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def tokenize_words(text_col):
    """Whitespace word stream after lower+trim+whitespace-collapse --
    the same normalization recipe the bigram LM and n-gram dedup use,
    so scores compose with those ops."""
    return F.split(
        F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "), " "
    )


def hashed_bucket(word_col, n_buckets: int = 1024):
    """Deterministic hashing-trick bucket in [0, n_buckets): first 24
    md5 bits of the word.  md5, not xxhash: every engine (and the
    DuckDB oracle) agrees on md5 of UTF-8 bytes."""
    return (
        F.conv(F.substring(F.md5(word_col), 1, 6), 16, 10).cast("long")
        % n_buckets
    )


def hashed_unigram_weights(
    tokens: DataFrame,
    target_flag: str = "_is_target",
    n_buckets: int = 1024,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Laplace-smoothed integer importance weight per hash bucket.

    ``tokens`` is a token stream (one row per token occurrence)
    carrying ``bucket_col`` and a boolean ``target_flag``; corpus and
    target counts come out of ONE conditional aggregation pass, not
    two scans.  Output: (bucket, weight) with at most ``n_buckets``
    rows -- small enough to broadcast at any corpus size, which is
    the whole point of the hashing trick.
    """
    counts = tokens.groupBy(bucket_col).agg(
        F.count("*").alias("_ccnt"),
        F.count_if(F.col(target_flag)).alias("_tcnt"),
    )
    return counts.select(
        bucket_col,
        F.expr(
            f"(_tcnt + 1) * {SCALE} div (_ccnt + {n_buckets})"
        ).alias("weight"),
    )


def importance_scores(
    docs: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Score every document by summed bucket importance of its tokens.

    ``target_pred`` is a boolean Column selecting the target subset
    (e.g. ``F.col("source") == "src1"`` for the curated source).
    Output: (id, n_tokens, importance) -- importance is an exact
    BIGINT; resampling then draws proportionally to it.
    """
    toks = docs.select(
        F.col(id_col),
        target_pred.alias("_is_target"),
        F.explode(tokenize_words(F.col(text_col))).alias("_w"),
    ).where(F.col("_w") != "")
    toks = toks.select(
        id_col, "_is_target", hashed_bucket(F.col("_w"), n_buckets).alias("bucket")
    )
    weights = hashed_unigram_weights(toks, n_buckets=n_buckets)
    return (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("weight").alias("importance"),
        )
    )
