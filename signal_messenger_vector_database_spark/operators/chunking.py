"""T2/T3/T4/F4/F5 — fixed-size word chunking as a pure explode expression.

The reference (``process_dataframe``, src/rag/dataframes.rs:46-111):

- counts cl100k tokens (T1); if ``tokens <= 512`` the message passes through
  as a single row (F4, src/rag/dataframes.rs:55);
- otherwise splits on whitespace (T2, :66-70), computes
  ``chunks = ceil(words / 384)`` (T4, :71-72 — 384 = 512*3/4, :48-49) and
  emits one row per 384-word slice (T3, :74-106), dropping empty chunks
  (F5, :91).

This implementation is 1-row->N-rows via ``transform(sequence(...))`` +
``explode`` — no Python, no shuffle; the explode pipelines inside the same
stage as the scan, so at 100 TB it is embarrassingly parallel.

Reference quirks (SURVEY T5) are *fixed by default* here: we store the
chunk's own text and the chunk's own token count.  The reference instead
embedded/stored the full original body per chunk and the full-text token
count (src/rag/dataframes.rs:81,83,101) — duplicating the whole message N
times — which its own commented-out DataFrame code shows was not intended.
``strict_reference_mode=True`` reproduces the reference behavior
bit-for-bit for parity testing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count, whitespace_words

IDEAL_TOKEN_SIZE = 512  # src/rag/dataframes.rs:48
IDEAL_CHUNK_WORDS = IDEAL_TOKEN_SIZE * 3 // 4  # = 384, src/rag/dataframes.rs:49


def chunk_text(
    df: DataFrame,
    text_col: str = "body",
    ideal_token_size: int = IDEAL_TOKEN_SIZE,
    chunk_words: int | None = None,
    strict_reference_mode: bool = False,
) -> DataFrame:
    """Append columns ``chunk_id``, ``chunk_text``, ``chunk_tokens`` and
    ``tokens`` (full-text count), exploding long texts into chunks.

    Output keeps every input column; short texts yield exactly one row with
    ``chunk_id = 0`` and ``chunk_text = <full text>``.
    """
    cw = chunk_words if chunk_words is not None else ideal_token_size * 3 // 4

    toks = token_count(text_col)
    words = whitespace_words(text_col)
    n_chunks = F.ceil(F.size(words) / F.lit(float(cw))).cast("int")  # T4 ceil-div

    # F4 branch: short text -> single pseudo-chunk of the full text.
    chunks = F.when(
        toks <= F.lit(ideal_token_size),
        F.array(F.struct(F.lit(0).alias("chunk_id"), F.col(text_col).alias("chunk_text"))),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda j: F.struct(
                j.cast("int").alias("chunk_id"),
                F.array_join(F.slice(words, j * cw + 1, cw), " ").alias("chunk_text"),
            ),
        )
    )

    out = (
        df.withColumn("tokens", toks)
        .withColumn("_chunk", F.explode(chunks))
        .select("*", "_chunk.chunk_id", "_chunk.chunk_text")
        .drop("_chunk")
        .withColumn("chunk_tokens", token_count("chunk_text"))
        # F5 empty-chunk guard — the reference only applies it on the long
        # path (src/rag/dataframes.rs:91); short texts pass through even
        # when empty, so gate on the same condition.
        .filter(
            (F.col("tokens") <= F.lit(ideal_token_size))
            | (F.col("chunk_tokens") > 0)
        )
    )
    if strict_reference_mode:
        # Bug-compatible: body/tokens are the FULL text's, per chunk.
        out = out.withColumn("chunk_text", F.col(text_col)).withColumn(
            "chunk_tokens", F.col("tokens")
        )
    return out
