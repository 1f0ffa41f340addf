"""Unicode text normalization: handcrafted transformations."""

from __future__ import annotations

from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.functions.text import normalize_text


def _norm(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], ["text"])
    return df.select(normalize_text(F.col("text")).alias("n")).first()["n"]


def test_control_chars_stripped(spark):
    assert _norm(spark, "abcde") == "abcde"


def test_unicode_spaces_fold_to_ascii(spark):
    assert _norm(spark, "a b c d　e") == "a b c d e"


def test_zero_width_marks_removed(spark):
    assert _norm(spark, "a\u200bb\u200dc\ufeffd") == "abcd"


def test_quotes_and_dashes_straightened(spark):
    assert (
        _norm(spark, "\u2018x\u2019 \u201cy\u201d \u2013 \u2014")
        == "'x' \"y\" - -"
    )


def test_ellipsis_expanded(spark):
    assert _norm(spark, "wait\u2026 what") == "wait... what"


def test_whitespace_collapsed_and_trimmed(spark):
    assert _norm(spark, "  a \t\n b  c  ") == "a b c"


def test_vertical_tab_agrees_with_re2(spark):
    """Java \\s includes \\x0B but RE2's does not; the control strip
    removes VT before the collapse so both engines agree."""
    assert _norm(spark, "a\x0bb") == "ab"


def test_plain_ascii_is_identity(spark):
    assert _norm(spark, "already clean text.") == "already clean text."
