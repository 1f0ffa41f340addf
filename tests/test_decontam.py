"""Benchmark decontamination (functions/decontam.py) semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.functions.decontam import (
    contamination_report,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_basic_and_short(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e f"),
            (2, "a b c d"),  # < 5 words -> no 5-grams
            (3, "  A   b\tC d e  "),  # normalization: case + whitespace
            (4, "x x x x x x x"),  # within-doc repeats dedup
        ],
    ).select("doc_id", word_ngrams(F.col("text"), 5).alias("g"))
    out = {r["doc_id"]: r["g"] for r in df.collect()}
    assert out[1] == ["a b c d e", "b c d e f"]
    assert out[2] == []
    assert out[3] == ["a b c d e"]
    assert out[4] == ["x x x x x"]


def test_contamination_report_counts(spark):
    # eval doc contributes grams "e1..e5" and "e2..e6"
    eval_df = _docs(spark, [(100, "e1 e2 e3 e4 e5 e6")])
    train = _docs(
        spark,
        [
            (1, "pad e1 e2 e3 e4 e5 tail"),  # 1 shared gram
            (2, "e1 e2 e3 e4 e5 e6"),  # both grams shared
            (3, "totally different words here okay"),  # clean
            (4, "too short"),  # no grams at all
        ],
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_contaminated"])
        for r in contamination_report(train, eval_df, n=5).collect()
    }
    assert out == {1: (3, 1), 2: (2, 2)}  # clean docs absent


def test_contamination_broadcast_and_shuffle_paths_agree(spark):
    eval_df = _docs(spark, [(100, "q w e r t y u")])
    train = _docs(
        spark,
        [(i, f"pad{i} q w e r t tail") for i in range(20)]
        + [(99, "nothing in common at all here")],
    )
    a = sorted(
        map(
            tuple,
            contamination_report(train, eval_df, broadcast_eval=True).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            contamination_report(train, eval_df, broadcast_eval=False).collect(),
        )
    )
    assert a == b and len(a) == 20


def test_clean_corpus_via_anti_join(spark):
    eval_df = _docs(spark, [(100, "a b c d e")])
    train = _docs(
        spark,
        [(1, "a b c d e extra"), (2, "completely unrelated text body here")],
    )
    report = contamination_report(train, eval_df)
    clean = train.join(report.select("doc_id"), "doc_id", "left_anti")
    assert [r["doc_id"] for r in clean.collect()] == [2]
