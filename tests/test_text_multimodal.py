"""Text-analysis and multimodal-plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.functions.multimodal import (
    decode_media,
    make_fake_media,
    sample_frames,
)
from nearscan_kafka_streams_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    word_tokens,
)


def _docs(spark):
    rows = [
        (0, "the cat and the dog is to be of note"),
        (1, "der hund ist nicht die katze und der vogel"),
        (2, "le chat et la souris les animaux des bois"),
        (3, "xyzzy plugh"),
        (4, ""),
        (5, "   "),
        (6, "word"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_count(spark):
    got = {
        r["doc_id"]: r["n"]
        for r in _docs(spark)
        .select("doc_id", token_count(F.col("text")).alias("n"))
        .collect()
    }
    assert got[0] == 10
    assert got[4] == 0
    assert got[5] == 0
    assert got[6] == 1


def test_lang_id(spark):
    got = {
        r["doc_id"]: r["lang"]
        for r in _docs(spark)
        .select("doc_id", lang_id(F.col("text")).alias("lang"))
        .collect()
    }
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "und"
    assert got[4] == "und"


def test_quality_score_bounds(spark):
    rows = _docs(spark).select(
        "doc_id", quality_score(F.col("text")).alias("q")
    ).collect()
    for r in rows:
        assert 0.0 <= r["q"] <= 1.0


def test_word_tokens_bpe_ish(spark):
    row = (
        spark.createDataFrame([(1, "Hello, world42!")], ["id", "text"])
        .select(word_tokens(F.col("text")).alias("t"))
        .collect()[0]
    )
    assert row["t"] == ["hello", ",", "world", "42", "!"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "A  B\tC"), (2, "a b c"), (3, "a b d")], ["id", "text"]
    )
    fps = [
        r["fp"] for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()
    ]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_multimodal_decode_shapes(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "x" * 3000), (2, "")], ["doc_id", "text"]
    )
    media = make_fake_media(docs)
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    assert out["0"]["n_bytes"] == 11
    assert out["1"]["n_bytes"] == 3000
    assert out["2"]["n_bytes"] == 0
    assert 1 <= out["0"]["width"] <= 64
    # deterministic: same payload -> same fake decode
    again = {r["media_id"]: r for r in decode_media(media).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_multimodal_real_decode_is_stubbed(spark):
    docs = spark.createDataFrame([(0, "abc")], ["doc_id", "text"])
    media = make_fake_media(docs)
    with pytest.raises(NotImplementedError):
        decode_media(media, real=True)


def test_frame_sampling_counts(spark):
    docs = spark.createDataFrame(
        [(0, "x" * 100), (1, "y" * 2500)], ["doc_id", "text"]
    )
    media = make_fake_media(docs)
    counts = (
        sample_frames(media, every_n_bytes=1024)
        .groupBy("media_id")
        .count()
        .collect()
    )
    got = {r["media_id"]: r["count"] for r in counts}
    assert got["0"] == 1  # max(100//1024, 1)
    assert got["1"] == 2  # 2500//1024


def test_media_metadata_sha(spark):
    import hashlib

    docs = spark.createDataFrame([(0, "hello")], ["doc_id", "text"])
    row = make_fake_media(docs).select("meta.sha_hex").collect()[0]
    assert row["sha_hex"] == hashlib.sha256(b"hello").hexdigest()


def test_repetition_profile_known_answers(spark):
    """Hand-computed Gopher-style repetition counters; blank text is a
    single empty word in BOTH engines (split of '' is ['']), so no
    special case -- upstream quality filters drop blanks first."""
    from nearscan_kafka_streams_spark.functions.text import repetition_profile

    docs = spark.createDataFrame(
        [
            (1, "a a a b a b x"),  # run of 3 a's; 'a a' and 'a b' twice
            (2, "one"),            # single word: no bigrams, run of 1
            (3, "Tick  tock TICK tock"),  # case-fold + multi-space
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_distinct_words"],
            r["max_run_len"], r["top_bigram_count"],
        )
        for r in repetition_profile(docs).collect()
    }
    assert got[1] == (7, 3, 3, 2)
    assert got[2] == (1, 1, 1, 0)
    assert got[3] == (4, 2, 1, 2)  # 'tick tock' twice


def test_scrub_pii_crafted(spark):
    """PII patterns must hit crafted emails/phones/IPs (the synthetic
    corpus has none -- this is the non-vacuous check) and the scrub
    must redact exactly those spans."""
    from nearscan_kafka_streams_spark.functions.text import (
        redaction_count,
        scrub_text,
    )

    docs = spark.createDataFrame(
        [
            (1, "mail a.user@example.com or call 555-123-4567"),
            (2, "server at 10.0.255.7 is fine"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    rows = docs.select(
        "doc_id",
        redaction_count(F.col("text")).alias("n"),
        scrub_text(F.col("text")).alias("s"),
    ).collect()
    got = {r["doc_id"]: (r["n"], r["s"]) for r in rows}
    assert got[1] == (2, "mail <REDACTED> or call <REDACTED>")
    assert got[2] == (1, "server at <REDACTED> is fine")
    assert got[3] == (0, "nothing sensitive here")


def test_repetition_profile_randomized_vs_reference(spark):
    """100 seeded-random word-soup docs: Spark counters must equal a
    pure-Python reference implementation exactly (single Spark call)."""
    import random
    from collections import Counter

    from nearscan_kafka_streams_spark.functions.text import repetition_profile

    rng = random.Random(11)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    docs = []
    for i in range(100):
        n = rng.randrange(1, 40)
        words = [rng.choice(vocab) for _ in range(n)]
        # inject runs sometimes
        if rng.random() < 0.5:
            w = rng.choice(vocab)
            pos = rng.randrange(len(words))
            words[pos:pos] = [w] * rng.randrange(2, 6)
        docs.append((i, " ".join(words)))

    def ref(text):
        ws = text.split(" ")
        runs, cur = [], 1
        for a, b in zip(ws, ws[1:]):
            cur = cur + 1 if a == b else 1
            runs.append(cur)
        max_run = max(runs, default=1)
        bigrams = Counter(" ".join(p) for p in zip(ws, ws[1:]))
        top_bg = max(bigrams.values(), default=0)
        return (len(ws), len(set(ws)), max_run, top_bg)

    expect = {i: ref(t) for i, t in docs}
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_distinct_words"],
            r["max_run_len"], r["top_bigram_count"],
        )
        for r in repetition_profile(
            spark.createDataFrame(docs, ["doc_id", "text"])
        ).collect()
    }
    assert got == expect
