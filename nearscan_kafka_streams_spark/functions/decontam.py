"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

A training-corpus pipeline must remove (or at least mark) documents
that contain verbatim benchmark content, or downstream evals are
meaningless.  The standard detector (GPT-3 appendix C / PaLM / Llama
practice) is word-level n-gram overlap: any training doc sharing at
least one n-gram (n ~ 5..13) with the eval set is contaminated.

Absent from the reference (an event-stream engine, SURVEY (S)2.8); a
first-class north-star operator here.

Scale design (100 TB corpus, MB..GB eval set):

* The eval side collapses to ONE table of distinct n-gram hashes --
  millions of rows at most for real benchmarks -- broadcast to every
  executor: the train side then never shuffles; each partition streams
  its grams past the in-memory hash set (`broadcast_eval=True`).
* A huge eval side degrades gracefully to a repartition join on the
  gram hash (`broadcast_eval=False`) -- both sides shuffle once on a
  uniformly-distributed key.
* Gram explosion is bounded per doc before the join: ``array_distinct``
  dedups within-doc repeats, so a doc contributes at most
  (words - n + 1) join rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def word_ngrams(text: F.Column, n: int = 5) -> F.Column:
    """Distinct word-level n-grams (space-joined strings) of normalized
    text; empty array when the doc has fewer than ``n`` words.

    Kept as raw strings (not hashed) so a SQL oracle reproduces values
    exactly; hash with xxhash64 downstream when only equality matters.

    The word array is LET-BOUND via a single-element outer transform:
    higher-order-function lambdas inline captured expressions, so a
    lambda referencing the regex+split chain directly re-evaluates it
    PER ARRAY ELEMENT (cost ~ words^2 per doc -- measured 1.9x slower
    at 50k synthetic docs, worse for longer ones).  Binding the chain
    to a lambda variable evaluates it once per row with no persist or
    projection barrier.
    """
    words = F.split(F.regexp_replace(F.lower(F.trim(text)), _WS, " "), " ")

    def grams_of(ws: F.Column) -> F.Column:
        # sequence(1, k) with k < 1 would yield a DESCENDING sequence
        # -- guard short docs explicitly
        k = F.size(ws) - (n - 1)
        idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, n)))

    return F.array_distinct(F.transform(F.array(words), grams_of)[0])


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_eval: bool = True,
    stats_out: dict | None = None,
) -> DataFrame:
    """Per-train-doc contamination counts against an eval corpus.

    Output: (id_col, n_grams, n_contaminated) for every train doc
    sharing >= 1 word n-gram with ANY eval doc; clean docs are absent
    (anti-join against this result to keep the clean corpus).

    ``stats_out``: pass a dict to have the stage sizes COUNTED into it
    (n_eval_grams = broadcast set size, n_train_gram_rows = the
    exploded train-side stream, n_hit_rows = join output before the
    per-doc rollup).  The operator is linear by construction -- cost ~
    n_train_gram_rows -- so a scale-stress harness recording these
    next to the timing can tell data growth from host noise (the same
    observability discipline jaccard_similarity_join's candidate
    counts follow).  Costs extra actions; diagnostics path only.
    """
    from nearscan_kafka_streams_spark.functions.dedup import (
        _persist_tracked,
        _spread,
    )

    grams = word_ngrams(F.col(text_col), n)
    # gram generation is the CPU-heavy narrow stage; a small corpus
    # arrives as ONE scan partition (file bin-packing), which would
    # serialize it -- spread to core count first (no-op at scale,
    # where the scan already has many splits)
    train_sets = _spread(train).select(
        F.col(id_col), grams.alias("grams")
    ).withColumn("n_grams", F.size("grams"))
    eval_grams = (
        _spread(eval_df).select(F.explode(grams).alias("gram")).distinct()
    )
    if stats_out is not None:
        eval_grams = _persist_tracked(eval_grams)
        stats_out["n_eval_grams"] = eval_grams.count()
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    train_stream = train_sets.select(
        id_col, "n_grams", F.explode("grams").alias("gram")
    )
    if stats_out is not None:
        train_stream = _persist_tracked(train_stream)
        stats_out["n_train_gram_rows"] = train_stream.count()
    hits = train_stream.join(eval_grams, "gram")
    if stats_out is not None:
        hits = _persist_tracked(hits)
        stats_out["n_hit_rows"] = hits.count()
    return hits.groupBy(id_col, "n_grams").agg(
        F.count(F.lit(1)).cast("long").alias("n_contaminated")
    )
