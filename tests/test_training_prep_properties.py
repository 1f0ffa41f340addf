"""Property-based checks for the corpus_prep operators against pure-
Python references on small random corpora (hypothesis; example counts
kept low because each example runs a Spark job)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nearscan_kafka_streams_spark.functions.corpus_prep import (
    pack_sequences,
    remove_repeated_chunks,
)

# a tiny closed vocabulary maximizes chunk collisions
WORDS = ["a", "bb", "ccc", "dd", "e"]


def _doc(rng_words: list[int]) -> str:
    return " ".join(WORDS[i] for i in rng_words)


corpus_strategy = st.lists(
    st.lists(st.integers(0, len(WORDS) - 1), min_size=0, max_size=30),
    min_size=1,
    max_size=12,
)


def _py_pack(token_counts: list[tuple[int, int]], L: int):
    """Reference: concat in id order, split at L boundaries."""
    out, pos = [], 0
    for doc_id, n in token_counts:
        if n <= 0:
            continue
        beg, end = pos, pos + n
        for seq in range(beg // L, (end - 1) // L + 1):
            fb, fe = max(beg, seq * L), min(end, (seq + 1) * L)
            out.append((seq, doc_id, fb - seq * L, fe - fb, fb - beg))
        pos = end
    return sorted(out)


def _py_remove_chunks(docs: list[tuple[int, str]], chunk: int):
    """Reference: keep-first across the corpus by (doc_id, chunk_idx)."""
    pieces = {}
    for doc_id, text in sorted(docs):
        toks = text.split()
        if not toks:
            continue
        n_chunks = math.ceil(len(toks) / chunk)
        pieces[doc_id] = [
            " ".join(toks[i * chunk : (i + 1) * chunk]) for i in range(n_chunks)
        ]
    seen: set[str] = set()
    out = {}
    for doc_id in sorted(pieces):
        kept = []
        dropped = 0
        for p in pieces[doc_id]:
            if p in seen:
                dropped += 1
            else:
                seen.add(p)
                kept.append(p)
        out[doc_id] = (" ".join(kept), dropped)
    return out


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy)
def test_pack_sequences_matches_python_reference(spark, corpus):
    rows = [(i, _doc(w)) for i, w in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.seq_id, r.doc_id, r.frag_start, r.frag_tokens, r.doc_offset)
        for r in pack_sequences(df, seq_len=7).collect()
    )
    want = _py_pack([(i, len(w)) for i, w in enumerate(corpus)], 7)
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy)
def test_remove_repeated_chunks_matches_python_reference(spark, corpus):
    rows = [(i, _doc(w)) for i, w in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_dropped)
        for r in remove_repeated_chunks(df, chunk=3).collect()
    }
    want = _py_remove_chunks(rows, 3)
    assert got == want
