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
- ``repetition_profile`` -- Gopher-style word/bigram repetition counters
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


# C4/MassiveText-style scrub patterns: written to the common subset of
# Java regex (Spark) and RE2 (DuckDB oracle) -- no backrefs, no
# lookaround -- so both engines redact identically
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def scrub_text(
    text: Column,
    patterns: dict[str, str] | None = None,
    replacement: str = "<REDACTED>",
) -> Column:
    """Redact every match of every pattern (applied in dict order).

    The corpus-cleaning PII/deny-list scrub (C4 and MassiveText both
    ship this step): pure ``regexp_replace`` chain, whole-stage
    codegen, no Python.  Counts are a separate column
    (:func:`redaction_count`) computed on the ORIGINAL text so pattern
    order cannot hide overlapping matches from the count.
    """
    out = text
    for pat in (patterns or PII_PATTERNS).values():
        out = F.regexp_replace(out, pat, replacement)
    return out


def redaction_count(text: Column, patterns: dict[str, str] | None = None) -> Column:
    """Total matches across patterns, each counted on the original text."""
    total = F.lit(0)
    for pat in (patterns or PII_PATTERNS).values():
        total = total + F.regexp_count(text, F.lit(pat))
    return total


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition counters: the quality signals behind the
    Gopher/MassiveText repetition filters (Rae et al. 2021, public) --
    heavily repeated content is the single strongest boilerplate/spam
    indicator in web-scale training corpora.

    Returns one row per input row:

    - ``n_words``          total whitespace words
    - ``n_distinct_words`` distinct words (dup-word fraction =
      1 - distinct/total, left to the caller)
    - ``max_run_len``      longest run of consecutive identical words
    - ``top_bigram_count`` occurrences of the most frequent word bigram
      (0 when fewer than 2 words)

    All counters are INTEGERS so the DuckDB oracle matches exactly (no
    float-division rounding hazards).  Scale shape: the distinct/total
    counters are per-row array expressions (codegen, no shuffle); runs
    and bigrams explode words once and aggregate keyed on the doc id --
    map-side partial aggregation collapses each doc's bigrams before
    the exchange, so the shuffle carries ~distinct-bigrams-per-doc, not
    words.  No driver data pulls.
    """
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), _WS, " "), " "
    )
    base = df.select(F.col(id_col), words.alias("_w")).select(
        id_col,
        F.size("_w").cast("long").alias("n_words"),
        F.size(F.array_distinct("_w")).cast("long").alias("n_distinct_words"),
    )

    exploded = df.select(
        F.col(id_col), F.posexplode(words).alias("_pos", "_word")
    )
    win = Window.partitionBy(id_col).orderBy("_pos")
    seq = exploded.select(
        id_col,
        "_pos",
        "_word",
        F.lead("_word").over(win).alias("_nxt"),
        # run boundary: first word of the doc or a word change
        F.coalesce(
            (F.col("_word") != F.lag("_word").over(win)).cast("int"), F.lit(1)
        ).alias("_chg"),
    ).withColumn("_run_id", F.sum("_chg").over(win))

    runs = (
        seq.groupBy(id_col, "_run_id")
        .agg(F.count(F.lit(1)).alias("_len"))
        .groupBy(id_col)
        .agg(F.max("_len").alias("max_run_len"))
    )
    bigrams = (
        seq.where(F.col("_nxt").isNotNull())
        .select(id_col, F.concat_ws(" ", "_word", "_nxt").alias("_bg"))
        .groupBy(id_col, "_bg")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("top_bigram_count"))
    )

    return (
        base.join(runs, id_col, "left")
        .join(bigrams, id_col, "left")
        .select(
            id_col,
            "n_words",
            "n_distinct_words",
            F.coalesce("max_run_len", F.lit(0)).alias("max_run_len"),
            F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
        )
    )


def normalize_text(text: Column) -> Column:
    """Unicode cleanup for web-scraped text (the C4/CCNet "fix the
    bytes before filtering" step): strip control chars and zero-width
    marks, fold unicode space variants to ASCII space, straighten
    curly quotes, unify dashes, expand the ellipsis char, collapse
    whitespace, trim.

    Pure regexp_replace/translate chain -- whole-stage codegen, no
    Python.  Patterns stay in the Java-regex ∩ RE2 subset (the
    `\\x{...}` escape both engines accept) so the op is
    DuckDB-oracle-checkable; step order matters and is mirrored
    verbatim in the oracle SQL (queries.TEXT_NORMALIZE_SQL).
    Note RE2's ``\\s`` excludes vertical-tab while Java's includes it:
    the control strip (step 1) removes VT first, so the final
    whitespace collapse agrees across engines."""
    x = F.regexp_replace(
        text,
        "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}\\x{007F}]",
        "",
    )
    x = F.regexp_replace(
        x,
        "[\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]",
        " ",
    )
    x = F.regexp_replace(x, "[\\x{200B}-\\x{200D}\\x{FEFF}]", "")
    x = F.translate(x, "‘’“”", "''\"\"")
    x = F.translate(x, "–—―", "---")
    x = F.regexp_replace(x, "\\x{2026}", "...")
    x = F.regexp_replace(x, "\\s+", " ")
    return F.trim(x)


def fingerprint(text: Column) -> Column:
    """64-bit content fingerprint of whitespace-normalized lowercase text.

    ``xxhash64`` -- stable across Spark versions and partitionings; the
    document-identity key for exact dedup at corpus scale (group by
    fingerprint instead of shuffling full documents).
    """
    normalized = F.regexp_replace(F.lower(F.trim(text)), _WS, " ")
    return F.xxhash64(normalized)


def gopher_gates(text: Column) -> Column:
    """The Gopher/MassiveText DOCUMENT-LEVEL quality gates (Rae et al.
    2021, arXiv:2112.11446 A.1.1) as a struct of per-rule booleans plus
    the combined verdict -- every threshold compared with INTEGER
    cross-multiplication (``10*symbols <= n_words`` rather than
    ``ratio <= 0.1``) so the flags are bit-identical across engines.

    Rules: word count in [50, 100k]; mean word length in [3, 10];
    symbol-to-word ratio (# or ...) <= 0.1; <=90% of lines bullet-led;
    <=30% of lines ellipsis-ended; >=80% of words contain an alphabetic
    character; >=2 distinct required stop words present.

    One narrow codegen pass per document -- no shuffle, no Python; the
    gate composes with ``repetition_profile`` (the paper's other half)
    for the full MassiveText filter.
    """
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    ws = F.filter(F.split(norm, " "), lambda w: w != "")
    n_words = F.size(ws)
    sum_len = F.aggregate(
        F.transform(ws, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    n_symbols = (
        F.size(F.split(text, r"#", -1))
        - 1
        + F.size(F.split(text, r"\.\.\.", -1))
        - 1
    ).cast("long")
    lines = F.split(text, r"\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).startswith("-")
            | F.trim(ln).startswith("•"),
        )
    )
    n_ellipsis = F.size(F.filter(lines, lambda ln: F.trim(ln).endswith("...")))
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[a-z]")))
    required = F.array(
        *[F.lit(w) for w in ("the", "be", "to", "of", "and", "that", "have", "with")]
    )
    n_required = F.size(F.array_intersect(F.array_distinct(ws), required))

    word_count_ok = (n_words >= 50) & (n_words <= 100_000)
    mean_len_ok = (sum_len >= 3 * n_words) & (sum_len <= 10 * n_words)
    symbol_ok = 10 * n_symbols <= n_words.cast("long")
    bullet_ok = 10 * n_bullet <= 9 * n_lines
    ellipsis_ok = 10 * n_ellipsis <= 3 * n_lines
    alpha_ok = 5 * n_alpha >= 4 * n_words
    stopword_ok = n_required >= 2
    return F.struct(
        n_words.cast("long").alias("n_words"),
        word_count_ok.alias("word_count_ok"),
        mean_len_ok.alias("mean_len_ok"),
        symbol_ok.alias("symbol_ok"),
        bullet_ok.alias("bullet_ok"),
        ellipsis_ok.alias("ellipsis_ok"),
        alpha_ok.alias("alpha_ok"),
        stopword_ok.alias("stopword_ok"),
        (
            word_count_ok
            & mean_len_ok
            & symbol_ok
            & bullet_ok
            & ellipsis_ok
            & alpha_ok
            & stopword_ok
        ).alias("passes_gopher"),
    )
