"""Text primitives: tokenization, word splitting, fingerprinting.

The reference counts tokens with the cl100k_base BPE
(``num_tokens_from_str``, src/rag/dataframes.rs:32-39; empty string -> 0)
and splits on whitespace for chunking (src/rag/dataframes.rs:66-70).
tiktoken is not available in this environment, so the engine's canonical
tokenizer is a BPE-ish regex (word runs + single punctuation marks) that is

1. deterministic,
2. expressible as a pure Catalyst expression (``regexp_extract_all`` —
   JVM-side, whole-stage codegen, no Python), and
3. expressible in identical form in DuckDB for the oracle check.

A cl100k adapter can be slotted in as a pandas UDF where exact-parity
token counts are required (see operators/embed.py for the pattern).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ASCII classes only, so Java-regex (Spark) and RE2 (DuckDB) agree exactly.
TOKEN_PATTERN = "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: Column | str) -> Column:
    """BPE-ish token count; NULL/empty -> 0 (the reference's
    ``unwrap_or("")`` + empty fast-path, src/rag/dataframes.rs:34-36,52)."""
    c = F.coalesce(_c(col), F.lit(""))
    return F.when(c == "", F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), 0))
    ).cast("int")


def whitespace_words(col: Column | str) -> Column:
    """``split_whitespace()`` semantics (src/rag/dataframes.rs:66-70):
    empty/blank -> empty array, runs of whitespace collapse."""
    c = F.trim(F.coalesce(_c(col), F.lit("")))
    return F.when(c == "", F.array().cast("array<string>")).otherwise(
        F.split(c, "\\s+")
    )


def word_count(col: Column | str) -> Column:
    """Vestigial ``get_essay_length`` (src/rag/dataframes.rs:41-44, A3)."""
    return F.size(whitespace_words(col))


def portable_round(col: Column, digits: int = 4) -> Column:
    """Engine-portable rounding: floor(x * 10^d + 0.5) / 10^d.

    Spark's ROUND rounds the double's exact binary expansion (HALF_UP on
    BigDecimal) while DuckDB rounds the shortest decimal repr — at a
    .00005 boundary they disagree.  Small-denominator rationals (ratios,
    Jaccard scores) hit such boundaries in practice.  Floor-based rounding
    evaluates identically on both engines because both execute the same
    double ops.  SQL twin: ``floor((x) * 10^d + 0.5) / 10^d``."""
    s = float(10**digits)
    return F.floor(col * s + F.lit(0.5)) / F.lit(s)


def fingerprint_md5(col: Column | str) -> Column:
    """Exact-dup document fingerprint: md5 of whitespace-normalized text.
    md5 is bit-identical between Spark and DuckDB, so dedup keyed on it is
    fully oracle-checkable."""
    c = F.coalesce(_c(col), F.lit(""))
    return F.md5(F.regexp_replace(F.trim(c), "\\s+", " "))
