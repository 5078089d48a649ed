"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.10):
tokenization stats, quality scoring, language-ID heuristic, document
fingerprinting.  All native Column expressions — JVM-side, codegen'd,
no Python in the hot path — so they run at scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword inventories for the n-gram/stopword
# language heuristic. Deliberately small and ASCII-only: the heuristic
# must be cheap, deterministic, and expressible in any ANSI engine for
# oracle checking.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "los", "las", "una"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans"],
}

_WS = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization; the BPE-ish variant is `bpe_pieces`."""
    return F.split(F.trim(text), _WS)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_pieces(text: Column) -> Column:
    """BPE-ish sub-word segmentation: runs of letters, runs of digits,
    or single non-space symbols — a regex approximation of byte-pair
    pre-tokenization (GPT-2 style splitter, simplified)."""
    return F.regexp_extract_all(
        F.lower(text), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), 1
    )


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of stopword occurrences for one language."""
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 1))


def lang_guess(text: Column) -> Column:
    """Stopword-vote language ID. Deterministic argmax with fixed
    preference order en > es > de > fr; 'und' (undetermined) when no
    stopwords hit at all."""
    en, es, de, fr = (stopword_hits(text, lg) for lg in ("en", "es", "de", "fr"))
    return (
        F.when((en + es + de + fr) == 0, F.lit("und"))
        .when((en >= es) & (en >= de) & (en >= fr), F.lit("en"))
        .when((es >= de) & (es >= fr), F.lit("es"))
        .when(de >= fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"([.,;:!?])"), 1))


def digit_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"([0-9])"), 1))


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0,1]: rewards mid-length
    documents and real word structure, penalizes punctuation/digit
    noise.  Integer counts -> double ratios, deterministic across
    engines (same IEEE ops in the same order)."""
    n_chars = F.length(text).cast("double")
    n_tok = token_count(text).cast("double")
    avg_tok_len = n_chars / F.greatest(n_tok, F.lit(1.0))
    punct_ratio = punct_count(text).cast("double") / F.greatest(n_chars, F.lit(1.0))
    digit_ratio = digit_count(text).cast("double") / F.greatest(n_chars, F.lit(1.0))
    len_term = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    word_term = F.when(
        (avg_tok_len >= 3.0) & (avg_tok_len <= 10.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return (
        F.lit(0.5) * len_term
        + F.lit(0.3) * word_term
        - F.lit(0.1) * punct_ratio
        - F.lit(0.1) * digit_ratio
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), _WS, " "))


def fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint of the normalized text.
    (md5 here for cross-engine checkability; xxhash64 is the cheaper
    in-Spark alternative when the oracle isn't involved.)"""
    return F.md5(normalize_text(text))
