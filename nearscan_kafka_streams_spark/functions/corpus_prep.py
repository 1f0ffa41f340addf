"""Training-corpus preparation operators: sequence packing,
corpus-wide repeated-chunk removal, deterministic shuffle-to-shards.

These are the writer-side steps between a cleaned corpus and a
training run: pack the token stream into fixed-length sequences,
strip corpus-wide boilerplate, and shuffle reproducibly.  All three
are pure DataFrame -> DataFrame functions (no state, no driver data),
registered as oracle-checked queries in queries.py and stress-measured
at 10x in bench.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    stats_out: dict | None = None,
) -> DataFrame:
    """GPT-style pretraining packing: concatenate the corpus token
    stream in ``id_col`` order and split at fixed ``seq_len``-token
    boundaries; documents SPAN boundaries (concat-and-chunk).  Output:
    one row per (sequence, document-fragment) -- (seq_id, id, frag_start,
    frag_tokens, doc_offset), the manifest a tokenizing writer consumes.

    Scale shape: global offsets via the distributed prefix scan
    (functions/scan.py -- no single-task window); the per-doc explode
    emits at most ``1 + ceil(n_tokens / seq_len)`` rows, so output is
    proportional to input and the corpus shuffles exactly once.

    ``stats_out``: pass a dict to have the linear terms COUNTED into
    it (n_docs, total_tokens; output rows are bounded by
    n_docs + total_tokens/seq_len) so a scale-stress harness can tell
    data growth from host noise next to the timing.  Costs one extra
    action; diagnostics path only.
    """
    from nearscan_kafka_streams_spark.functions.scan import global_running_sum
    from nearscan_kafka_streams_spark.functions.text import token_count

    toks = df.select(
        F.col(id_col), token_count(F.col(text_col)).cast("long").alias("n_tokens")
    ).where(F.col("n_tokens") > 0)
    if stats_out is not None:
        from nearscan_kafka_streams_spark.functions.dedup import (
            _persist_tracked,
        )

        toks = _persist_tracked(toks)
        agg = toks.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t")
        ).collect()[0]
        stats_out["n_docs"] = agg["n"]
        stats_out["total_tokens"] = agg["t"]
    run = global_running_sum(toks, id_col, "n_tokens", out_col="end_tok")
    run = run.withColumn("beg_tok", F.col("end_tok") - F.col("n_tokens"))
    frag = run.select(
        id_col,
        "beg_tok",
        "end_tok",
        F.explode(
            F.sequence(
                F.expr(f"beg_tok div {seq_len}"),
                F.expr(f"(end_tok - 1) div {seq_len}"),
            )
        ).alias("seq_id"),
    )
    seq_beg = F.col("seq_id") * seq_len
    frag_beg = F.greatest(F.col("beg_tok"), seq_beg)
    frag_end = F.least(F.col("end_tok"), seq_beg + seq_len)
    return frag.select(
        "seq_id",
        id_col,
        (frag_beg - seq_beg).alias("frag_start"),
        (frag_end - frag_beg).alias("frag_tokens"),
        (frag_beg - F.col("beg_tok")).alias("doc_offset"),
    )


def remove_repeated_chunks(
    df: DataFrame,
    chunk: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style repeated-span REMOVAL (the rewrite, not just detection):
    cut each document into consecutive ``chunk``-token pieces; a piece
    whose exact text occurs elsewhere in the corpus survives only at
    its corpus-wide first occurrence (min (id, chunk_idx)); re-emit each
    document with surviving pieces re-joined in order.  Output:
    (id, clean_text, n_dropped).  Blank documents carry no chunks and
    are not re-emitted.

    Scale shape: keeper selection is groupBy(chunk_text).agg(min(struct))
    -- map-side PARTIAL aggregation bounds a boilerplate chunk at one
    row per map partition -- then a semi join on the full (chunk, id,
    idx) triple, which hash-distributes hot chunks across partitions.
    Linear in corpus token count; no all-pairs anything.
    """
    from nearscan_kafka_streams_spark.functions.dedup import _persist_tracked

    toks = df.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("t"),
    ).where(F.length(F.trim(F.col(text_col))) > 0)
    # chunks feeds THREE plan branches (keeper aggregate, semi-join
    # probe, per-doc totals) with different shuffle keys; staging it
    # once stops the tokenize/explode/slice chain from re-running per
    # branch (released via functions.dedup.release_cached)
    chunks = _persist_tracked(
        toks.select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0), F.ceil(F.size("t") / chunk).cast("long") - 1
                )
            ).alias("chunk_idx"),
            F.col("t"),
        ).select(
            id_col,
            "chunk_idx",
            F.array_join(
                F.slice(F.col("t"), F.col("chunk_idx") * chunk + 1, chunk), " "
            ).alias("chunk_text"),
        )
    )
    firsts = chunks.groupBy("chunk_text").agg(
        F.min(F.struct(id_col, "chunk_idx")).alias("_first")
    )
    keepers = firsts.select(
        "chunk_text",
        F.col(f"_first.{id_col}").alias(id_col),
        F.col("_first.chunk_idx").alias("chunk_idx"),
    )
    kept = chunks.join(
        keepers, ["chunk_text", id_col, "chunk_idx"], "left_semi"
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                lambda s: s.chunk_text,
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = chunks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_chunks"))
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
    )


def shuffle_to_shards(
    df: DataFrame,
    n_shards: int = 16,
    seed: str = "epoch0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic seeded GLOBAL SHUFFLE into training shards: shard
    and within-shard position are pure functions of (seed, id) via md5
    -- the reproducible 'shuffle the corpus before epoch 0' step.
    ``orderBy(rand())`` is partitioning-dependent and changes under
    task retry; a keyed hash order is identical across engines, runs,
    and cluster sizes.  Output: (shard_id, pos, id).

    Scale shape: one hash shuffle on shard_id; per-shard row_number is
    a partitioned window, never a global sort.
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    hashed = df.select(
        F.col(id_col),
        h.alias("_h"),
        (F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % n_shards).alias(
            "shard_id"
        ),
    )
    w = Window.partitionBy("shard_id").orderBy("_h", id_col)
    return hashed.select(
        "shard_id", F.row_number().over(w).alias("pos"), id_col
    )
