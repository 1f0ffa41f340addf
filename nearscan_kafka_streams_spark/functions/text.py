"""Text-analysis operators for large-scale document pipelines.

All pure column expressions (no Python per row): at 100 TB these run
inside whole-stage codegen, scale linearly with executors, and push
column pruning down to the parquet scan (only ``text`` is read).

Semantics are deliberately simple and SQL-portable so each operator
has a DuckDB oracle (driver t2 gate):

- ``token_count``     -- whitespace tokenization count
- ``word_tokens``     -- BPE-ish lowercase word/number/punct pieces
- ``quality_score``   -- length / punctuation / stopword-ratio heuristic
- ``lang_id``         -- stopword-hit heuristic over a small language table
- ``fingerprint``     -- 64-bit content fingerprint of normalized text
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword inventories for the heuristic language id;
# chosen to be disjoint enough for headline languages
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "una", "por"],
}

_WS = r"\s+"


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, _WS))
    )


def word_tokens(text: Column) -> Column:
    """BPE-ish tokenization: lowercase word / number / single-punct pieces.

    A regex approximation of byte-pair pretokenization (GPT-2 style
    splits words, numbers, and punctuation runs apart) -- the cheap
    JVM-side stand-in for a real tokenizer when counting training
    tokens at corpus scale.
    """
    return F.regexp_extract_all(
        F.lower(text), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), F.lit(1)
    )


def punct_ratio(text: Column) -> Column:
    """(non-alnum, non-space chars) / chars; 0 for empty text."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(stripped) / F.length(text)
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """fraction of whitespace tokens that are stopwords of ``lang``."""
    words = LANG_STOPWORDS[lang]
    lowered = F.lower(text)
    tokens = F.split(F.trim(lowered), _WS)
    hits = F.size(F.filter(tokens, lambda t: t.isin(*words)))
    n = token_count(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0, 1].

    score = 0.4 * length_factor + 0.3 * (1 - punct_ratio)
          + 0.3 * min(1, stopword_ratio('en') * 5)
    where length_factor = min(1, chars / 500).  Mirrors the common
    C4/Gopher-style length+symbol+stopword filters, condensed into one
    monotone score.
    """
    length_factor = F.least(F.lit(1.0), F.length(text) / F.lit(500.0))
    return (
        F.lit(0.4) * length_factor
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text))
        + F.lit(0.3) * F.least(F.lit(1.0), stopword_ratio(text, "en") * F.lit(5.0))
    )


def lang_id(text: Column) -> Column:
    """Pick the language whose stopword inventory hits most tokens.

    Ties / zero hits -> 'und' (undetermined), matching CLD-style
    behavior for too-short text.  Deterministic tie-break: languages
    checked in fixed order, strict > required to displace.
    """
    lowered = F.lower(text)
    tokens = F.split(F.trim(lowered), _WS)

    def _hits(words: list[str]):
        # closure factory: Spark inspects lambda arity (no default args)
        return lambda t: t.isin(*words)

    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang, words in LANG_STOPWORDS.items():
        hits = F.size(F.filter(tokens, _hits(words)))
        is_better = hits > best_hits
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(is_better, hits).otherwise(best_hits)
    return best_lang


def fingerprint(text: Column) -> Column:
    """64-bit content fingerprint of whitespace-normalized lowercase text.

    ``xxhash64`` -- stable across Spark versions and partitionings; the
    document-identity key for exact dedup at corpus scale (group by
    fingerprint instead of shuffling full documents).
    """
    normalized = F.regexp_replace(F.lower(F.trim(text)), _WS, " ")
    return F.xxhash64(normalized)
