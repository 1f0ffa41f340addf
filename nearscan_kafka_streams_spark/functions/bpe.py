"""Distributed BPE tokenizer training + corpus tokenization.

Training-data pipelines need real token counts (shard packing, budget
accounting, mixture weighting) -- whitespace counts drift 2-4x from BPE
counts.  This is the standard byte-pair-encoding trainer in its
distributed form (the architecture HuggingFace tokenizers / SentencePiece
use, re-expressed Spark-first):

1. WORD FREQUENCY TABLE (distributed): one pass over the corpus --
   normalize, split, explode, groupBy(word).count().  100 TB of text
   collapses to a vocabulary-sized table (natural-language vocab is
   bounded: ~10^6 distinct words), optionally truncated to the top-N
   words, which loses only singleton-tail mass.
2. MERGE LOOP (driver, bounded): classic BPE pair counting over the
   word-frequency dict.  Each iteration touches only the words
   containing the merged pair; the table is MBs, so driver memory and
   milliseconds per merge -- a distributed merge loop would pay a full
   shuffle per merge for no accuracy gain.
3. TOKENIZE (distributed): merges broadcast to executors; each
   partition applies them with a longest-first merge loop inside an
   Arrow-batched ``mapInPandas`` kernel (CPU-bound per-word work --
   exactly the Pandas-UDF niche; per-batch memoization collapses
   repeated words, so cost ~ distinct words per batch, not rows).

Deterministic: ties in pair counts break lexicographically, so the
same corpus always yields the same merge list.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_WS = r"\s+"


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_words: int | None = None,
) -> DataFrame:
    """(word, freq) over normalized whitespace-split text.

    ``max_words`` truncates to the most frequent N (deterministic
    tie-break on the word) -- the scale knob that bounds the driver
    merge loop's input regardless of corpus size.
    """
    words = df.select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), _WS, " "), " ")
        ).alias("word")
    ).where(F.col("word") != "")
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    if max_words is not None:
        freq = freq.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(
            max_words
        )
    return freq


def train_bpe_merges(
    word_freq: list[tuple[str, int]],
    n_merges: int = 100,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table.

    Pure driver-side Python over the BOUNDED vocab table (step 2 of the
    module contract; ``max_words`` in the callers is the spec of that
    bound, not an approximation knob).  Returns merges in application
    order.

    Incremental (the subword-nmt trainer optimization): pair counts and
    a pair->words inverted index are maintained across iterations, so
    each merge touches ONLY the words containing the merged pair --
    instead of rescanning every word every iteration, which is
    O(n_merges x vocab) and takes hours at a production 50k-merge
    vocabulary.  Best-pair selection is a lazy max-heap: stale entries
    (pushed before a later count change) are discarded on pop by
    comparing against the live count.  Heap order (-count, pair) IS the
    determinism contract: max count, then lexicographically smallest
    pair.

    ``stats`` (optional dict) receives ``words_touched`` (total word
    visits across all merges) and ``n_words`` -- the observable that
    pins the incremental complexity claim in tests without wall-clock
    flakiness.
    """
    import heapq

    # aggregate duplicate surface words, then index by position so words
    # that only BECOME equal after a merge stay independently updatable
    agg: dict[tuple[str, ...], int] = {}
    for word, freq in word_freq:
        t = tuple(word)
        agg[t] = agg.get(t, 0) + int(freq)
    syms: list[list[str]] = [list(t) for t in agg]
    freqs: list[int] = list(agg.values())

    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for wid, sym in enumerate(syms):
        f = freqs[wid]
        for pair in zip(sym, sym[1:]):
            pair_counts[pair] += f
            where.setdefault(pair, set()).add(wid)

    heap: list[tuple[int, tuple[str, str]]] = [
        (-c, p) for p, c in pair_counts.items()
    ]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    words_touched = 0
    while len(merges) < n_merges and heap:
        neg, best = heapq.heappop(heap)
        live = pair_counts.get(best, 0)
        if -neg != live:  # stale entry; the live count was re-pushed
            continue
        if live < 2:
            break
        merges.append(best)
        merged = "".join(best)
        touched: set[tuple[str, str]] = set()
        for wid in where.pop(best, set()):
            words_touched += 1
            sym, f = syms[wid], freqs[wid]
            # retract this word's pair contributions, re-add post-merge
            for pair in zip(sym, sym[1:]):
                pair_counts[pair] -= f
                touched.add(pair)
                s = where.get(pair)
                if s is not None:
                    s.discard(wid)
                    if not s:
                        del where[pair]
            new_sym: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    new_sym.append(merged)
                    i += 2
                else:
                    new_sym.append(sym[i])
                    i += 1
            syms[wid] = new_sym
            for pair in zip(new_sym, new_sym[1:]):
                pair_counts[pair] += f
                touched.add(pair)
                where.setdefault(pair, set()).add(wid)
        for pair in touched:
            c = pair_counts.get(pair, 0)
            if c <= 0:
                pair_counts.pop(pair, None)
            else:
                heapq.heappush(heap, (-c, pair))
    if stats is not None:
        stats["words_touched"] = words_touched
        stats["n_words"] = len(syms)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word)
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    max_words: int | None = 200_000,
) -> list[tuple[str, str]]:
    """End-to-end training: distributed word counts -> driver merge
    loop.  The collect is bounded by ``max_words`` rows, not the corpus.
    """
    wf = [
        (r["word"], r["freq"])
        for r in word_frequencies(df, text_col, max_words).collect()
    ]
    return train_bpe_merges(wf, n_merges)


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens, n_tokens) -- BPE segmentation of each document.

    Merges ship to executors via the serialized closure (KBs); the
    kernel memoizes per-batch word encodings, so cost scales with
    distinct words per Arrow batch.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("tokens", ArrayType(StringType())),
            StructField("n_tokens", IntegerType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = _encode_word(word, ranks)
            return got

        for pdf in batches:
            toks, counts = [], []
            for text in pdf[text_col].astype(str):
                words = re.sub(r"\s+", " ", text.lower().strip()).split(" ")
                doc_tokens: list[str] = []
                for w in words:
                    if w:
                        doc_tokens.extend(enc(w))
                toks.append(doc_tokens)
                counts.append(len(doc_tokens))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": pd.Series(counts, dtype="int32"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)


def save_merges(
    spark, merges: list[tuple[str, str]], path: str
) -> None:
    """Persist a trained merge list as a rank-ordered parquet artifact
    -- the tokenizer IS this table.  Training happens once per corpus
    release; every downstream job (packing, token counting, serving
    parity checks) loads the artifact instead of retraining, and the
    artifact diffs/versions like any other table."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    spark.createDataFrame(
        rows, "rank INT, left STRING, right STRING"
    ).repartition(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    """Load a merge artifact back into the exact training-order list
    (rank restores order -- parquet row order is not contractual)."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]
