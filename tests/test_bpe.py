"""BPE trainer/tokenizer (functions/bpe.py) semantics."""

from __future__ import annotations

import random

from nearscan_kafka_streams_spark.functions.bpe import (
    _encode_word,
    bpe_tokenize,
    train_bpe,
    train_bpe_merges,
    word_frequencies,
)


def test_merge_learning_canonical_example():
    """The Sennrich et al. (2016) worked example: with 'es' dominant,
    the first merges build up 'est' from the frequent suffixes."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_merges(wf, n_merges=4)
    assert merges[0] == ("e", "s")  # 9 occurrences, the clear max
    assert merges[1] == ("es", "t")  # 9 again after the first merge
    assert len(merges) == 4


def test_merge_determinism_on_ties():
    # both pairs occur exactly twice -> lexicographic tie-break
    wf = [("ab", 2), ("cd", 2)]
    merges = train_bpe_merges(wf, n_merges=1)
    assert merges == [("a", "b")]


def test_encode_word_applies_merges_in_rank_order():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert _encode_word("newest", ranks) == ["n", "e", "w", "est"]
    assert _encode_word("low", ranks) == ["low"]
    assert _encode_word("x", ranks) == ["x"]
    assert _encode_word("", ranks) == []


def test_encode_matches_naive_reference_on_random_words():
    """Rank-order encoding == the naive apply-merges-one-by-one loop."""
    rng = random.Random(11)
    alphabet = "abcd"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    ]
    wf = [(w, 1) for w in sorted(set(words))]
    merges = train_bpe_merges(wf, n_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}

    def naive(word: str) -> list[str]:
        sym = list(word)
        for a, b in merges:  # merges are learned in application order
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    for w in words:
        assert _encode_word(w, ranks) == naive(w), w


def _naive_train_bpe_merges(word_freq, n_merges):
    """The textbook rescan-everything trainer: recount all pairs over all
    words every iteration.  Reference semantics for the incremental
    trainer (identical tie-breaking: max count, then lexicographically
    smallest pair)."""
    from collections import Counter

    symbols = {}
    for word, freq in word_freq:
        symbols[tuple(word)] = symbols.get(tuple(word), 0) + int(freq)
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, freq in symbols.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = "".join(best)
        out = {}
        for sym, freq in symbols.items():
            s, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    s.append(merged)
                    i += 2
                else:
                    s.append(sym[i])
                    i += 1
            out[tuple(s)] = out.get(tuple(s), 0) + freq
        symbols = out
    return merges


def _random_vocab(rng, n_words, alphabet="abcdefgh", max_len=12):
    words = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, max_len)))
        for _ in range(n_words)
    }
    return [(w, rng.randint(1, 50)) for w in sorted(words)]


def test_incremental_trainer_matches_naive_reference():
    """The incremental pair-count trainer must produce EXACTLY the naive
    trainer's merge list -- same pairs, same order, same early-stop --
    on random vocabularies (incl. overlapping-pair words like 'aaaa')."""
    rng = random.Random(7)
    for seed in range(5):
        rng.seed(seed)
        wf = _random_vocab(rng, 150) + [("aaaa", 3), ("aaa", 2), ("aa", 5)]
        assert train_bpe_merges(wf, n_merges=60) == _naive_train_bpe_merges(
            wf, 60
        ), seed


def test_incremental_trainer_touches_few_words():
    """The incremental trainer's complexity claim, pinned by OPERATION
    COUNT (deterministic -- a wall-clock ratio flakes under CI
    contention): across 1000 merges it must visit only words containing
    each merged pair, a small fraction of the n_merges x vocab word
    visits the naive rescan trainer performs.  Result equality with the
    rescan trainer is asserted on the same run."""
    rng = random.Random(42)
    wf = _random_vocab(rng, 3000, alphabet="abcdefghijklmnop", max_len=16)

    stats: dict = {}
    fast = train_bpe_merges(wf, n_merges=1000, stats=stats)
    slow = _naive_train_bpe_merges(wf, 1000)
    assert fast == slow

    n_merges_done = len(fast)
    naive_visits = n_merges_done * stats["n_words"]
    # measured: 12.6k touches vs 2.77M naive visits (~220x); assert a
    # conservative 10x bound so vocab-shape drift doesn't flake it
    assert stats["words_touched"] * 10 < naive_visits, (
        stats,
        n_merges_done,
    )


def test_distributed_pipeline_end_to_end(spark):
    rows = [
        (1, "the newest widest lowest"),
        (2, "the lowest newest"),
        (3, "  The   NEWEST  "),  # normalization folds into doc 1/2's words
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wf = {
        r["word"]: r["freq"] for r in word_frequencies(df).collect()
    }
    assert wf["the"] == 3 and wf["newest"] == 3 and wf["lowest"] == 2

    merges = train_bpe(df, n_merges=20)
    out = {r["doc_id"]: r for r in bpe_tokenize(df, merges).collect()}
    assert out[4]["n_tokens"] == 0 and out[4]["tokens"] == []
    # same word -> same segmentation everywhere; doc 3 is doc's "the newest"
    t1, t3 = out[1]["tokens"], out[3]["tokens"]
    assert t3 == t1[: len(t3)] or set(t3) <= set(t1)
    assert out[1]["n_tokens"] == len(t1)
    # enough merges: frequent words collapse to single tokens
    assert "the" in t1


def test_max_words_truncation_is_deterministic(spark):
    rows = [(i, "alpha beta gamma " * (i + 1)) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top2 = sorted(
        r["word"] for r in word_frequencies(df, max_words=2).collect()
    )
    assert top2 == ["alpha", "beta"]  # equal freqs -> lexicographic


def test_merge_artifact_round_trip(spark, tmp_path):
    """save_merges/load_merges: the reloaded tokenizer reproduces the
    in-memory one token-for-token (order restored by rank, not by
    parquet row order)."""
    from nearscan_kafka_streams_spark.functions.bpe import (
        bpe_tokenize,
        load_merges,
        save_merges,
        train_bpe,
    )

    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "newer new newest")],
        ["doc_id", "text"],
    )
    merges = train_bpe(df, n_merges=12)
    path = str(tmp_path / "tokenizer")
    save_merges(spark, merges, path)
    reloaded = load_merges(spark, path)
    assert reloaded == merges

    a = {r["doc_id"]: r["tokens"] for r in bpe_tokenize(df, merges).collect()}
    b = {r["doc_id"]: r["tokens"] for r in bpe_tokenize(df, reloaded).collect()}
    assert a == b
