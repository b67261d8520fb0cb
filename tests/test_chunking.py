"""T2/T3/T4/F4/F5 chunking — boundary arithmetic from
src/rag/dataframes.rs:46-106 (512-token threshold, 384-word chunks,
ceil-div chunk count, empty-chunk guard)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.operators.chunking import chunk_text


def _chunk(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "body string")
    return chunk_text(df, text_col="body", **kw).select(
        "chunk_id", "chunk_text", "chunk_tokens", "tokens"
    ).collect()


def test_short_text_single_chunk(spark):
    rows = _chunk(spark, "hello world")
    assert len(rows) == 1
    assert rows[0].chunk_id == 0
    assert rows[0].chunk_text == "hello world"


def test_empty_text_single_empty_chunk(spark):
    rows = _chunk(spark, "")
    assert len(rows) == 1
    assert rows[0].tokens == 0


def test_exact_chunk_boundary(spark):
    # 8 words with threshold so the long path triggers; chunk_words=4
    # => exactly 2 chunks of 4 (boundary: no empty 3rd chunk)
    text = " ".join(f"w{i}" for i in range(8))
    rows = _chunk(spark, text, ideal_token_size=4, chunk_words=4)
    assert [r.chunk_id for r in rows] == [0, 1]
    assert all(len(r.chunk_text.split()) == 4 for r in rows)


def test_boundary_plus_one(spark):
    # 9 words / 4 per chunk => 3 chunks (ceil-div), last has 1 word
    text = " ".join(f"w{i}" for i in range(9))
    rows = _chunk(spark, text, ideal_token_size=4, chunk_words=4)
    assert [r.chunk_id for r in rows] == [0, 1, 2]
    assert rows[-1].chunk_text == "w8"


def test_reference_sizes(spark):
    # 600 single-token words > 512 tokens => ceil(600/384) = 2 chunks
    text = " ".join(f"word{i}" for i in range(600))
    rows = _chunk(spark, text)
    assert len(rows) == 2
    assert len(rows[0].chunk_text.split()) == 384
    assert len(rows[1].chunk_text.split()) == 216


def test_whitespace_runs_collapse(spark):
    rows = _chunk(spark, "a\t\tb\n c", ideal_token_size=1, chunk_words=2)
    joined = " ".join(r.chunk_text for r in rows)
    assert joined.split() == ["a", "b", "c"]


def test_strict_reference_mode_duplicates_full_body(spark):
    text = " ".join(f"w{i}" for i in range(8))
    df = spark.createDataFrame([(text,)], "body string")
    rows = chunk_text(
        df, text_col="body", ideal_token_size=4, chunk_words=4,
        strict_reference_mode=True,
    ).collect()
    # bug-compatible: every chunk row carries the FULL body and full count
    assert len(rows) == 2
    assert all(r.chunk_text == text for r in rows)
    assert all(r.chunk_tokens == r.tokens for r in rows)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 999), min_size=1, max_size=120))
def test_chunking_is_lossless(spark, word_ids):
    """Property: words are partitioned losslessly across chunks."""
    text = " ".join(f"t{i}" for i in word_ids)
    rows = _chunk(spark, text, ideal_token_size=8, chunk_words=5)
    rows = sorted(rows, key=lambda r: r.chunk_id)
    rejoined = " ".join(r.chunk_text for r in rows).split()
    assert rejoined == text.split()
