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


def test_normalize_cross_engine_parity_fuzz(spark):
    """Spark's normalize_text vs the DuckDB oracle chain on RANDOM
    unicode: the Java-regex ∩ RE2 pattern subset must agree on inputs
    far uglier than the corpus (seeded, one batch per run)."""
    import random

    import duckdb

    alphabet = (
        list("ab c.\t\n-'\"")
        + [" ", " ", " ", "　", "​", "‍",
           "﻿", "‘", "’", "“", "”", "–",
           "—", "―", "…", "\x07", "\x0b", "\x1f", "\x7f"]
    )
    rng = random.Random(20260814)
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(80)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", normalize_text(F.col("text")).alias("n")
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    want = dict(
        con.execute(
            r"""
            SELECT i,
              trim(regexp_replace(
                regexp_replace(
                  translate(translate(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(text,
                          '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}]',
                          '', 'g'),
                        '[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]',
                        ' ', 'g'),
                      '[\x{200B}-\x{200D}\x{FEFF}]', '', 'g'),
                    chr(8216) || chr(8217) || chr(8220) || chr(8221),
                    '''' || '''' || '"' || '"'),
                  chr(8211) || chr(8212) || chr(8213), '---'),
                  '\x{2026}', '...', 'g'),
                '\s+', ' ', 'g')) AS n
            FROM t
            """
        ).fetchall()
    )
    assert got == want
