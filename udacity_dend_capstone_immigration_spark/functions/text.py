"""Text-analysis expressions for the training-data pipeline tier.

Everything here is a native column expression (regex / array higher-order
functions) — no Python UDFs — so text scoring over billions of documents
stays inside whole-stage codegen. Each function has an ANSI-SQL-expressible
equivalent used by the DuckDB oracle (``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Marker stopwords per language for the n-gram/stopword language heuristic.
#: Deliberately small and fixed: the heuristic is the *operator*; its lists
#: are config. Counts use list-filter (not set-intersect) so repeated tokens
#: count every occurrence.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "es": ("el", "la", "de", "y", "es", "en", "los"),
    "fr": ("le", "la", "de", "et", "est", "les", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
}

STOPWORDS = LANG_MARKERS["en"]

CJK_PATTERN = "[\\u4e00-\\u9fff]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse every non-alphanumeric run to a single space,
    trim. The canonical form for tokenizing/fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), "[^a-z0-9]+", " "))


def tokenize(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (empty strings removed)."""
    return F.filter(F.split(normalize_text(col), " "), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the cheap proxy for LLM token budgeting)."""
    return F.size(tokenize(col))


#: letter runs | digit runs | single non-alphanumeric non-space marks —
#: RE2-compatible (no lookarounds), so the DuckDB oracle runs the same
#: pattern verbatim.
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def bpe_ish_token_count(col: Column | str) -> Column:
    """A BPE-ish sub-word count: letter runs plus digit runs plus
    punctuation marks, the regex heuristic commonly used to approximate
    tokenizer output without shipping a vocab file."""
    return F.size(F.regexp_extract_all(F.lower(_c(col)), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def _index_range(count: Column) -> Column:
    """1..count as an array, EMPTY when count < 1. ``sequence(1, 0)``
    descends ([1, 0]) rather than being empty, which would feed index 0
    into slice/substr and crash on short inputs — real corpora always
    contain documents shorter than the shingle width."""
    return F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Character n-grams (shingles) of the normalized text."""
    norm = normalize_text(col)
    idx = _index_range(F.length(norm) - (n - 1))
    return F.transform(idx, lambda i: norm.substr(i, F.lit(n)))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles joined with single spaces."""
    toks = tokenize(col)
    idx = _index_range(F.size(toks) - (n - 1))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text.

    md5 (not xxhash64) so the fingerprint is reproducible across engines —
    the DuckDB oracle computes the identical value.
    """
    return F.md5(normalize_text(col))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are neither alphanumeric nor space."""
    c = _c(col)
    stripped = F.regexp_replace(F.lower(c), "[a-z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (occurrence-counted)."""
    toks = tokenize(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Document quality signals as a dict of named columns (length, token
    stats, punctuation and stopword ratios) — callers select what they
    need; everything stays one codegen stage."""
    c = _c(col)
    toks = tokenize(c)
    n_tok = F.size(toks)
    return {
        "n_chars": F.length(c),
        "n_tokens": n_tok,
        "avg_token_len": F.length(F.concat_ws("", toks)) / F.greatest(n_tok, F.lit(1)),
        "punct_ratio": punct_ratio(c),
        "stopword_ratio": stopword_ratio(c),
    }


def lang_marker_hits(col: Column | str, lang: str) -> Column:
    """Occurrence count of ``lang``'s marker stopwords in the token list."""
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(tokenize(col), lambda t: t.isin(*markers)))


def language_guess(col: Column | str) -> Column:
    """n-gram/stopword language heuristic.

    CJK characters win immediately; otherwise the language with the most
    marker-stopword hits, ties broken by the fixed preference order
    en > es > fr > de; zero hits everywhere → 'und' (undetermined).
    """
    c = _c(col)
    en, es, fr, de = (lang_marker_hits(c, lang) for lang in ("en", "es", "fr", "de"))
    return (
        F.when(F.regexp_count(c, F.lit(CJK_PATTERN)) > 0, F.lit("zh"))
        .when((en == 0) & (es == 0) & (fr == 0) & (de == 0), F.lit("und"))
        .when((en >= es) & (en >= fr) & (en >= de), F.lit("en"))
        .when((es >= fr) & (es >= de), F.lit("es"))
        .when(fr >= de, F.lit("fr"))
        .otherwise(F.lit("de"))
    )


#: PII-ish scrubbing patterns, RE2-compatible (no lookarounds, no
#: backslash classes — portable verbatim between Java regex and DuckDB).
#: Order matters when redacting: URLs first (they contain digits and
#: dots), then emails, then standalone digit runs.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "url": ("https?://[^ ]+", "[URL]"),
    "email": ("[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+", "[EMAIL]"),
    "digit_run": ("[0-9][0-9]+", "[NUM]"),
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-pattern match counts (over the lowercased text)."""
    c = F.lower(_c(col))
    return {
        name: F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    }


def redact_pii(col: Column | str) -> Column:
    """Replace every PII pattern occurrence with its placeholder token.

    A chained ``regexp_replace`` — one codegen stage, no UDFs. Matching
    is done on the lowercased text (emails/URLs are case-insensitive by
    nature; the corpus-normalization convention of this module).
    """
    out = F.lower(_c(col))
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out
