"""Text-analysis column functions (north-star ops, SURVEY.md §2.D).

Tokenization, word shingles, token counting, quality scoring, language-ID
heuristic, and document fingerprinting — all as JVM-side column
expressions (split / transform / aggregate / regexp), never row-at-a-time
Python. Each Spark builder has a DuckDB-SQL twin (``sql_*``) generated
from the same constants so the oracle stays in lockstep.

Reference analogs: prompt templating (`run_text_classifier.py:56-57`),
substring extraction (`run_multichoice_exam.py:112-116`); the analysis
ops themselves are the mandated extensions beyond the reference surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions.exprs import bind as _bind

# Explicit whitespace class: Java regex \s includes vertical tab
# (\x0B) but RE2's \s does not — `\s` in a shared pattern silently
# diverges between Spark and DuckDB on control characters (caught by
# tests/test_fuzz_parity.py). Spell the class out so both engines see
# identical semantics.
WS_CLASS = r" \t\n\x0B\f\r"

# BPE-ish token pattern: letter runs, digit runs, single punctuation.
TOKEN_PATTERN = rf"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{WS_CLASS}]"
PUNCT_PATTERN = rf"[^A-Za-z0-9{WS_CLASS}]"

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deterministic and engine-portable; accuracy is secondary to parity.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "los"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr": ("le", "la", "les", "de", "et", "un", "est"),
}

STOPWORDS = LANG_MARKERS["en"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(text: Column | str) -> Column:
    return F.split(_c(text), " ")


def word_count(text: Column | str) -> Column:
    return F.size(words(text))


def token_count(text: Column | str) -> Column:
    """BPE-ish token count via regexp (JVM-side; Spark 4 regexp_count)."""
    return F.regexp_count(_c(text), F.lit(TOKEN_PATTERN))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles; whole text if fewer than n words.

    The split-words array is let-bound so the per-shingle lambda reads a
    materialized array instead of re-splitting the document once per
    shingle (O(words²) otherwise — same hazard class as
    operators/dedup.winnow_from_hashes' scale note)."""
    return _bind(
        words(text),
        lambda ws: F.when(
            F.size(ws) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - n),
                lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
            ),
        ).otherwise(F.array(_c(text))),
    )


def char_shingles(text: Column | str, n: int = 5, step: int = 1) -> Column:
    """Character n-gram shingles; whole text if shorter than n chars.
    The n-gram-Jaccard dedup path (§2.D) uses these instead of word
    shingles — robust to whitespace/tokenization differences.

    ``step > 1`` gives sparse shingling (every step-th position): at a
    fixed n it halves/quarters the md5-hash and shuffle cost while the
    sampled-set Jaccard stays an unbiased similarity signal — the usual
    trade for web-scale corpora."""
    t = _c(text)
    return F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - n + 1, F.lit(step)),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array(t))


def stopword_ratio(text: Column | str) -> Column:
    ws = words(text)
    stop = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    return stop.cast("double") / F.size(ws)


def punct_ratio(text: Column | str) -> Column:
    """NULL for empty text (try_divide): under ANSI mode a plain division
    would abort the whole job on the first zero-length document — real
    corpora always contain some."""
    t = _c(text)
    return F.try_divide(
        F.regexp_count(t, F.lit(PUNCT_PATTERN)).cast("double"),
        F.length(t),
    )


def mean_word_length(text: Column | str) -> Column:
    ws = words(text)
    total = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    return total.cast("double") / F.size(ws)


def utf8_bytes_as_chars(c: Column | str) -> Column:
    """A string whose CHARACTERS are the input's UTF-8 BYTES
    (ISO-8859-1 maps all 256 byte values to BMP codepoints < U+0100).
    Codepoint-counting functions over this column count bytes — the
    portability primitive behind :func:`byte_levenshtein`. Hot-path
    callers comparing many pairs should materialize this ONCE per
    distinct string (see operators/linkage._block_name_pairs) instead
    of re-encoding per pair."""
    return F.decode(F.encode(_c(c), "UTF-8"), "ISO-8859-1")


def byte_levenshtein(a: Column | str, b: Column | str) -> Column:
    """Levenshtein distance over UTF-8 BYTES — the engine-portable
    form. Spark's ``levenshtein`` counts CODEPOINTS while DuckDB's
    counts bytes ('café'→'cafe' reads 1 vs 2); re-interpreting each
    string's UTF-8 bytes as ISO-8859-1 characters makes every byte one
    character, so Spark counts exactly DuckDB's byte edits. For ASCII
    input this is the classic codepoint distance unchanged; for
    non-ASCII the distance is well-defined (byte edits) and identical
    on both engines — closing the boundary the linkage twin used to
    pin as ASCII-only. Byte distance upper-bounds codepoint distance,
    so |codepoint_len(a) − codepoint_len(b)| ≤ byte distance and the
    length-band blocking proof (operators/linkage.py) carries over.
    THRESHOLD UNITS: callers filtering on this distance count byte
    edits — one accented-char edit costs 2, one CJK-char edit 3."""
    return F.levenshtein(utf8_bytes_as_chars(a), utf8_bytes_as_chars(b))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: longer docs with some stopwords
    and low punctuation score higher. Portable arithmetic only."""
    t = _c(text)
    len_term = F.least(F.length(t).cast("double") / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(t) * 5.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(t) * 10.0, F.lit(1.0))
    return F.round((len_term + stop_term + punct_term) / 3.0, 6)


def lang_guess(text: Column | str) -> Column:
    """Marker-lexicon language ID: argmax of per-language marker hits,
    deterministic tie-break by language code order."""
    ws = words(text)

    def in_markers(markers: tuple[str, ...]):
        # closure factory: a default-arg lambda would be misread by
        # PySpark's HOF arity inspection as a 2-arg (value, index) lambda
        return lambda w: w.isin(*markers)

    scores = {
        lang: F.size(F.filter(ws, in_markers(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    # Build reversed so earlier langs win ties (when() chains short-circuit).
    for lang in sorted(LANG_MARKERS, reverse=True):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


# PII patterns — engine-portable (Java regex and RE2 agree on these):
# simple by design; production lists are longer, the DATAFLOW is the same.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{4}\b"
PII_TOKEN = "[PII]"


def email_count(text: Column | str) -> Column:
    return F.regexp_count(_c(text), F.lit(EMAIL_RE))


def phone_count(text: Column | str) -> Column:
    return F.regexp_count(_c(text), F.lit(PHONE_RE))


def redact_pii(text: Column | str) -> Column:
    """Replace email/phone matches with a redaction token — the standard
    pre-training scrub, as pure JVM regexp_replace (no UDF)."""
    t = F.regexp_replace(_c(text), EMAIL_RE, PII_TOKEN)
    return F.regexp_replace(t, PHONE_RE, PII_TOKEN)


def repetition_ratio(text: Column | str) -> Column:
    """1 - distinct_words/words — the boilerplate/spam signal used by
    quality filters (high ratio = heavily repeated content)."""
    ws = words(text)
    return F.lit(1.0) - F.try_divide(
        F.size(F.array_distinct(ws)).cast("double"), F.size(ws)
    )


def fingerprint(text: Column | str, n: int = 3) -> Column:
    """Document fingerprint: min portable-hash over word shingles
    (1-permutation MinHash — a rolling-hash content signature)."""
    from genai_batch_processor_spark.functions.hashing import portable_hash60

    hashed = F.transform(shingles(text, n), portable_hash60)
    return F.array_min(hashed)


# -- DuckDB oracle fragments -------------------------------------------------


def sql_words(expr: str) -> str:
    return f"string_split({expr}, ' ')"


def sql_word_count(expr: str) -> str:
    return f"len(string_split({expr}, ' '))"


def sql_token_count(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{TOKEN_PATTERN}'))"


def sql_shingles(expr: str, n: int = 3) -> str:
    w = sql_words(expr)
    return (
        f"(CASE WHEN len({w}) >= {n} THEN "
        f"list_transform(generate_series(1, len({w}) - {n} + 1), "
        f"i -> array_to_string(({w})[i:i+{n - 1}], ' ')) "
        f"ELSE [{expr}] END)"
    )


def sql_char_shingles(expr: str, n: int = 5, step: int = 1) -> str:
    return (
        f"(CASE WHEN length({expr}) >= {n} THEN "
        f"list_transform(generate_series(1, length({expr}) - {n} + 1, {step}), "
        f"i -> substr({expr}, i, {n})) "
        f"ELSE [{expr}] END)"
    )


def _sql_in_list(markers: tuple[str, ...]) -> str:
    return ", ".join(f"'{m}'" for m in markers)


def sql_stopword_ratio(expr: str) -> str:
    w = sql_words(expr)
    return (
        f"(len(list_filter({w}, x -> x IN ({_sql_in_list(STOPWORDS)})))::DOUBLE"
        f" / len({w}))"
    )


def sql_punct_ratio(expr: str) -> str:
    return (
        f"(len(regexp_extract_all({expr}, '{PUNCT_PATTERN}'))::DOUBLE"
        f" / nullif(length({expr}), 0))"
    )


def sql_mean_word_length(expr: str) -> str:
    w = sql_words(expr)
    return f"(list_sum(list_transform({w}, x -> length(x)))::DOUBLE / len({w}))"


def sql_quality_score(expr: str) -> str:
    len_term = f"least(length({expr})::DOUBLE / 500.0, 1.0)"
    stop_term = f"least({sql_stopword_ratio(expr)} * 5.0, 1.0)"
    punct_term = f"(1.0 - least({sql_punct_ratio(expr)} * 10.0, 1.0))"
    return f"round(({len_term} + {stop_term} + {punct_term}) / 3.0, 6)"


def sql_lang_guess(expr: str) -> str:
    w = sql_words(expr)
    scores = {
        lang: f"len(list_filter({w}, x -> x IN ({_sql_in_list(m)})))"
        for lang, m in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    out = "'unknown'"
    for lang in sorted(LANG_MARKERS, reverse=True):
        out = (
            f"(CASE WHEN {scores[lang]} = {best} AND {best} > 0 "
            f"THEN '{lang}' ELSE {out} END)"
        )
    return out


def sql_email_count(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{EMAIL_RE}'))"


def sql_phone_count(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{PHONE_RE}'))"


def sql_redact_pii(expr: str) -> str:
    inner = f"regexp_replace({expr}, '{EMAIL_RE}', '{PII_TOKEN}', 'g')"
    return f"regexp_replace({inner}, '{PHONE_RE}', '{PII_TOKEN}', 'g')"


def sql_repetition_ratio(expr: str) -> str:
    w = sql_words(expr)
    return f"(1.0 - len(list_distinct({w}))::DOUBLE / len({w}))"


def sql_fingerprint(expr: str, n: int = 3) -> str:
    from genai_batch_processor_spark.functions.hashing import sql_hash60

    return (
        f"list_min(list_transform({sql_shingles(expr, n)}, "
        f"s -> {sql_hash60('s')}))"
    )
