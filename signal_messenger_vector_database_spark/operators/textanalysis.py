"""Text-analysis operators for the training-data pipeline: language ID,
quality scoring, rolling-hash fingerprinting, corpus stats.

All pure Catalyst expressions (higher-order array functions + regex) —
whole-stage codegen, no Python — and all portable to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import TOKEN_PATTERN, portable_round, whitespace_words

# marker stopwords per language for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "is", "and", "to"),
    "es": ("el", "la", "de", "es", "y", "que"),
    "fr": ("le", "la", "de", "et", "est", "que"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
}


def _lang_hits(words: Column, lang: str) -> Column:
    markers = list(LANG_MARKERS[lang])
    return F.size(F.filter(words, lambda w: w.isin(markers)))


def language_id(col: Column | str) -> Column:
    """Marker-stopword language heuristic: argmax of marker hits with a
    fixed priority order (en > es > fr > de) on ties; no hits -> 'und'."""
    words = whitespace_words(F.lower(F.col(col) if isinstance(col, str) else col))
    hits = {lang: _lang_hits(words, lang) for lang in LANG_MARKERS}
    best = None
    expr = F.lit("und")
    # build when-cascade in priority order: a language wins if its hits are
    # strictly greater than every earlier language's and > 0.
    langs = list(LANG_MARKERS)
    conds = []
    for lang in langs:
        cond = hits[lang] > 0
        for other in langs:
            if other == lang:
                continue
            if langs.index(other) < langs.index(lang):
                cond = cond & (hits[lang] > hits[other])
            else:
                cond = cond & (hits[lang] >= hits[other])
        conds.append((lang, cond))
    for lang, cond in reversed(conds):
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    _ = best
    return expr


def quality_features(col: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword / digit features + composite score
    (the 'quality scoring' operator of the north star)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    words = whitespace_words(c)
    n_words = F.size(words)
    n_chars = F.length(c)
    punct = F.size(F.regexp_extract_all(c, F.lit("[^A-Za-z0-9_\\s]"), 0))
    digits = F.size(F.regexp_extract_all(c, F.lit("[0-9]"), 0))
    stop = F.size(F.filter(words, lambda w: F.lower(w).isin(list(LANG_MARKERS["en"]))))
    nz_words = F.greatest(n_words, F.lit(1))
    nz_chars = F.greatest(n_chars, F.lit(1))
    mean_word_len = (n_chars - (n_words - 1)) / nz_words.cast("double")
    punct_ratio = punct / nz_chars.cast("double")
    digit_ratio = digits / nz_chars.cast("double")
    stop_ratio = stop / nz_words.cast("double")
    length_score = F.least(n_words / F.lit(50.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * (1 - F.least(punct_ratio * 5, F.lit(1.0)))
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
    )
    return {
        "n_words": n_words,
        "n_chars": n_chars,
        "mean_word_len": portable_round(mean_word_len, 4),
        "punct_ratio": portable_round(punct_ratio, 4),
        "digit_ratio": portable_round(digit_ratio, 4),
        "stop_ratio": portable_round(stop_ratio, 4),
        "quality_score": portable_round(score, 4),
    }


ROLLING_HASH_MOD = 1_000_000_007
ROLLING_HASH_BASE = 31


def rolling_hash(col: Column | str) -> Column:
    """Polynomial rolling hash over the character codes:
    h = fold(h * 31 + code) mod 1e9+7 — the 'document fingerprinting'
    operator; a sequential fold, identical in DuckDB via list_reduce."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    codes = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.ascii(F.substr(c, i, F.lit(1))),
    )
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(
        F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda acc, x: (acc * ROLLING_HASH_BASE + x) % ROLLING_HASH_MOD,
        )
    ).cast("long")


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus word frequencies: explode -> groupBy(word) -> count.
    Map-side partial aggregation keeps the shuffle at |vocab|, not |tokens|."""
    words = df.select(
        F.explode(whitespace_words(F.lower(F.col(text_col)))).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
