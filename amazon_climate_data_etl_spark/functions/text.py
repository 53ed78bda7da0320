"""Text-analysis column expressions for the ``documents`` table.

Large-scale training-data pipeline primitives (language ID, quality scoring,
token counting, fingerprinting), all as native Column expressions so they run
JVM-side inside whole-stage codegen — no Python in the hot path. Each has an
ANSI-SQL twin (``*_sql``) so the DuckDB oracle can verify the exact same
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.operators._portable import stable_round

# --------------------------------------------------------------------------
# Tokenization
# --------------------------------------------------------------------------


# Java regex \s is [ \t\n\x0B\f\r]; DuckDB's RE2 \s is [\t\n\f\r ] — the
# engines DISAGREE on vertical tab (\x0b), so every cross-engine expression
# uses this explicit class instead (divergence found by hypothesis in
# tests/test_property_portable.py).
WS = "[ \\t\\n\\x0B\\f\\r]"



# Engine-portable lowercasing: Java's lower() applies FULL Unicode case
# mapping (U+0130 -> "i" + combining dot, final-sigma contextual form);
# DuckDB's applies simple mapping — the results differ byte-for-byte on
# Turkish dotted capital I and Greek sigma (found by targeted probing after
# the hypothesis \x0b/\xa0 findings). translate() maps ONLY the 26 ASCII
# letters in both engines, so case-normalization is restricted to ASCII —
# a documented contract (production unicode casefolding needs one ICU
# implementation on both sides, which SQL engines do not give you).
_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(col: Column) -> Column:
    return F.translate(col, _UPPER, _LOWER)


def ascii_lower_sql(expr: str) -> str:
    return f"translate({expr}, '{_UPPER}', '{_LOWER}')"


def tokens(text: Column) -> Column:
    """Whitespace tokenization to array<string>; empty text → empty array.

    Spark's ``trim`` strips ASCII space only; DuckDB's one-arg ``trim``
    strips UNICODE whitespace (\\xa0 included), so every SQL twin spells
    ``trim(x, ' ')`` to pin the ASCII-space semantics (divergence found
    by hypothesis in tests/test_property_portable.py)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, WS + "+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer pattern (BPE-ish token counting): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs. The
# upstream pattern's trailing-whitespace branch uses a lookahead, which RE2
# (the DuckDB oracle's engine) lacks — here leftover whitespace simply goes
# unmatched, which is correct for *counting*. Alternation kept to ASCII
# classes so Java regex and RE2 agree byte-for-byte (verified in tests).
# \s spelled out explicitly inside the negated class too (Java/RE2 \x0b gap)
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\x0B\f\r]+"
)


def bpe_token_count(text: Column) -> Column:
    """Approximate BPE token count as a single JVM-side regexp_count — the
    pre-tokenizer piece count upper-bounds (and tracks) real BPE vocab
    counts without shipping a tokenizer model to executors."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN))


def bpe_token_count_sql(expr: str) -> str:
    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def token_count_sql(expr: str) -> str:
    # DuckDB: explicit whitespace class (see WS); guard empty strings.
    return (
        f"(CASE WHEN length(trim({expr}, ' ')) = 0 THEN 0 "
        f"ELSE len(string_split_regex(trim({expr}, ' '), '{WS}+')) END)"
    )


# --------------------------------------------------------------------------
# Quality scoring: cheap, deterministic heuristics of the kind used to filter
# web-scraped corpora (length, punctuation density, stopword ratio).
# --------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic.

    0.4 * length_ok (64 <= n_chars <= 100000)
    + 0.3 * min(1, stopword_hits / 8)
    + 0.3 * (1 - punct_ratio)  where punct_ratio = non-alnum-nonspace / chars
    """
    n = F.length(text)
    length_ok = F.when((n >= 64) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    toks = tokens(ascii_lower(text))
    hits = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in _STOPWORDS])))
    stop_ratio = F.least(F.lit(1.0), hits.cast("double") / F.lit(8.0))
    stripped = F.regexp_replace(text, "[A-Za-z0-9 \\t\\n\\x0B\\f\\r]", "")
    punct_ratio = F.when(n == 0, F.lit(1.0)).otherwise(F.length(stripped).cast("double") / n)
    # decimal-stable round (same path portable_sql_rounds rewrites the SQL
    # twin onto) — corpus_filter_funnel thresholds this value at 0.5, so an
    # asymmetric rounding route could flip a near-tie score cross-engine
    return stable_round(
        F.lit(0.4) * length_ok + F.lit(0.3) * stop_ratio + F.lit(0.3) * (F.lit(1.0) - punct_ratio),
        4,
    )


def quality_score_sql(expr: str) -> str:
    stop_list = ", ".join(f"'{s}'" for s in _STOPWORDS)
    return f"""round(
      0.4 * (CASE WHEN length({expr}) BETWEEN 64 AND 100000 THEN 1.0 ELSE 0.0 END)
      + 0.3 * least(1.0, len(list_intersect(list_distinct(string_split_regex(trim({ascii_lower_sql(expr)}, ' '), '{WS}+')), [{stop_list}])) / 8.0)
      + 0.3 * (1.0 - (CASE WHEN length({expr}) = 0 THEN 1.0
                      ELSE length(regexp_replace({expr}, '[A-Za-z0-9 \\t\\n\\x0B\\f\\r]', '', 'g')) * 1.0 / length({expr}) END)),
      4)"""


# --------------------------------------------------------------------------
# Language ID: marker-word counting heuristic (n-gram-free variant that is
# portable to ANSI SQL; a real deployment would swap in fastText via a pandas
# UDF — see sources/multimodal.py for the UDF plumbing pattern).
# --------------------------------------------------------------------------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
}


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))


def lang_guess(text: Column) -> Column:
    """argmax over marker-hit counts; 'und' (undetermined) when all zero.

    Ties break by fixed language order en > de > fr > es (deterministic).
    """
    toks = F.array_distinct(tokens(ascii_lower(text)))
    scores = {lang: _marker_hits(toks, m) for lang, m in _LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(list(_LANG_MARKERS)):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def lang_guess_sql(expr: str) -> str:
    toks = f"list_distinct(string_split_regex(trim({ascii_lower_sql(expr)}, ' '), '{WS}+'))"
    scores = {
        lang: f"len(list_intersect({toks}, [{', '.join(repr(m) for m in markers)}]))"
        for lang, markers in _LANG_MARKERS.items()
    }
    best = f"greatest({', '.join(scores.values())})"
    branches = " ".join(
        f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in _LANG_MARKERS
    )
    return f"(CASE WHEN {best} = 0 THEN 'und' {branches} ELSE 'und' END)"


# --------------------------------------------------------------------------
# Fingerprinting
# --------------------------------------------------------------------------


def doc_fingerprint(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-normalized lowercase text.

    md5 is content-addressed and engine-portable (identical in DuckDB),
    unlike ``xxhash64``/``hash`` which are Spark-specific.
    """
    normalized = F.regexp_replace(F.trim(ascii_lower(text)), WS + "+", " ")
    return F.md5(normalized)


def doc_fingerprint_sql(expr: str) -> str:
    return f"md5(regexp_replace(trim({ascii_lower_sql(expr)}, ' '), '{WS}+', ' ', 'g'))"
