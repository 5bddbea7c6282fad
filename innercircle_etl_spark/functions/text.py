"""Text-analysis column expressions for document pipelines.

All pure `pyspark.sql.functions` compositions — JVM-side, codegen'd,
no Python in the hot path. These are the building blocks a 100TB
training-data pipeline runs over every document, so staying off the
Python interpreter matters more here than anywhere.

Tokenization contract: documents are split on single spaces (the
synthetic corpus is space-normalized). For messy real corpora swap
`TOKEN_SEP` for a regex split — every downstream expression is
agnostic to how the token array was produced.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SEP = " "

# Stopword tables for the n-gram/stopword-ratio language heuristic.
# Tiny on purpose: broadcast as a literal array, no join needed.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "zu"),
    "fr": ("le", "la", "et", "de", "un"),
    "es": ("el", "la", "y", "de", "un"),
}


def tokens(text: Column) -> Column:
    """Token array."""
    return F.split(text, TOKEN_SEP)


def token_count(text: Column) -> Column:
    """Whitespace token count, INT."""
    return F.size(tokens(text)).cast("int")


def avg_token_len(text: Column) -> Column:
    """Mean token length in chars, DOUBLE. Computed as
    total_token_chars / n_tokens = (len - (n-1)) / n for single-space
    separated text — pure arithmetic, no explode."""
    n = F.size(tokens(text))
    total = F.length(text) - (n - F.lit(1))
    return total.cast("double") / n.cast("double")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``, DOUBLE."""
    sw = STOPWORDS[lang]
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return hits.cast("double") / F.size(toks).cast("double")


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: length band + lexical
    diversity + stopword presence — the shape of production quality
    filters (length/punct/stopword ratios), deterministic arithmetic.
    """
    toks = tokens(text)
    n = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    diversity = n_distinct / n
    length_band = F.when((n >= 20) & (n <= 400), 1.0).otherwise(0.5)
    sw = stopword_ratio(text, "en")
    return (0.4 * length_band + 0.4 * diversity + 0.2 * sw).alias("quality")


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts for the lang-ID heuristic."""
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*sw)))
        for lang, sw in STOPWORDS.items()
    }


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the sorted distinct token set —
    invariant to token order and repetition (the classic
    'fingerprint' canonicalization). Rolling-hash shingle
    fingerprints live in functions/sketches.py."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    return F.md5(canon)

# GPT-2-style pre-tokenizer, simplified to the ASCII classes the
# corpus uses: a word, a number run, a punctuation run (each with
# optional leading space), or a space run. Identical leftmost-first
# alternation semantics in Java regex (Spark) and RE2 (DuckDB).
BPE_ISH_PATTERN = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword-boundary token count, INT — the
    pre-tokenization pass every BPE/WordPiece tokenizer runs; its
    count is the standard proxy for LLM token budget at corpus
    scale. Pure regexp (JVM codegen), no UDF."""
    # Built from the parameter (not a hardcoded column name) so any
    # column or derived expression works.
    return F.size(
        F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0))
    ).cast("int")
