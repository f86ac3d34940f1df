"""Text column expressions, all built-in (codegen-able) — no Python UDFs.

Replaces the reference's row-at-a-time UDF zoo (SURVEY.md §2.9 D1-D12:
``hw2/BDM_hw2_final.py:54-60`` lower+strip-punctuation,
``hw3/hw3.py:41-66`` regex extract/clean chain,
``FinalProject/BDM_Final.py:92-120`` preprocess_text with broadcast
stopwords) with pure Spark SQL expressions that stay inside whole-stage
codegen. Null handling follows the reference convention (null → '' before
cleaning, ``FinalProject/BDM_Final.py:94-95``) so outputs hash-match.

Every op has a twin ``*_sql`` generator producing the equivalent DuckDB
expression, used by ``plans.queries`` to build oracle SQL from the same
constants — Spark and oracle can never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal English stopword list (fixed, versioned — NOT nltk-dependent;
#: the reference downloads nltk stopwords at runtime,
#: ``FinalProject/BDM_Final.py:83-86``, which is irreproducible).
EN_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
    "to", "was", "were", "will", "with",
)

_NORM_RE = "[^a-z0-9 ]"
_SQUEEZE_RE = " +"


def normalize_text(col: Column | str) -> Column:
    """lower → strip non-alphanumerics → squeeze spaces → trim; null → ''.

    Built-in replacement for UDFs D1/D5/D11/D12 (e.g. the ~30-char
    punctuation strip loop at ``hw2/BDM_hw2_final.py:54-60``).
    """
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    c = F.lower(c)
    c = F.regexp_replace(c, _NORM_RE, " ")
    c = F.regexp_replace(c, _SQUEEZE_RE, " ")
    return F.trim(c)


def normalize_text_sql(col: str) -> str:
    """DuckDB twin of :func:`normalize_text`."""
    return (
        f"trim(regexp_replace(regexp_replace(lower(coalesce({col}, '')),"
        f" '{_NORM_RE}', ' ', 'g'), '{_SQUEEZE_RE}', ' ', 'g'))"
    )


def tokenize(col: Column | str) -> Column:
    """normalize → split on single space → drop empty tokens.

    Built-in replacement for D6 (``hw3/hw3.py:61``) and the tokenizing
    half of D12. Returns ``array<string>``.
    """
    arr = F.split(normalize_text(col), " ")
    return F.filter(arr, lambda x: x != F.lit(""))


def tokenize_sql(col: str) -> str:
    """DuckDB twin of :func:`tokenize` (list of non-empty tokens)."""
    return (
        f"list_filter(string_split({normalize_text_sql(col)}, ' '),"
        f" x -> x <> '')"
    )


def remove_stopwords(tokens_col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Drop stopwords from a token array — ``array_except``-style but
    order/duplicate-preserving (matches the reference's word-by-word filter,
    ``FinalProject/BDM_Final.py:112-117``)."""
    lits = F.array(*[F.lit(w) for w in stopwords])
    return F.filter(tokens_col, lambda x: ~F.array_contains(lits, x))


def stopwords_sql_list(stopwords: tuple[str, ...] = EN_STOPWORDS) -> str:
    """SQL literal list of stopwords, e.g. ``('a','an',...)``."""
    inner = ", ".join(f"'{w}'" for w in stopwords)
    return f"({inner})"


def token_count(col: Column | str) -> Column:
    """Whitespace token count of the normalized text."""
    return F.size(tokenize(col))


def word_ngrams(tokens_col: Column, n: int) -> Column:
    """Word-level n-gram strings (space-joined) from a token array."""
    idx = F.sequence(F.lit(0), F.size(tokens_col) - F.lit(n))
    return F.when(F.size(tokens_col) >= n, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(tokens_col, i + 1, n))
    )).otherwise(F.array().cast("array<string>"))


def word_ngrams_sql(tokens_sql: str, n: int) -> str:
    """DuckDB twin of :func:`word_ngrams` over a token-list SQL expr."""
    return (
        f"CASE WHEN len({tokens_sql}) >= {n} THEN "
        f"list_transform(generate_series(1, len({tokens_sql}) - {n - 1}),"
        f" i -> array_to_string(list_slice({tokens_sql}, i, i + {n - 1}), ' '))"
        f" ELSE [] END"
    )


#: BPE-ish pre-tokenization pattern: letter runs | digit runs | punctuation
#: runs (the GPT-2 pattern family minus lookaheads, which RE2 — and hence
#: the DuckDB oracle — cannot express). Applied to lowercased raw text.
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish regex tokenization of the RAW (lowercased, un-normalized)
    text — unlike :func:`tokenize` it keeps digit runs and punctuation
    runs as tokens, the shape subword tokenizers pre-split on."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_RE), 0)


def bpe_tokens_sql(col: str) -> str:
    """DuckDB twin of :func:`bpe_tokens`."""
    return rf"regexp_extract_all(lower(coalesce({col}, '')), '[a-z]+|[0-9]+|[^a-z0-9\s]+')"
