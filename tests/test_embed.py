"""E1 embed stage: determinism, batching, newline scrub (P5)."""

from __future__ import annotations

import numpy as np
import pytest

from signal_messenger_vector_database_spark.operators.embed import (
    HashEmbedder,
    HttpEmbedder,
    with_embeddings,
)


def test_deterministic_and_unit_norm():
    e = HashEmbedder(32)
    a = e.embed_batch(["alpha", "beta", ""])
    b = e.embed_batch(["alpha", "beta", ""])
    assert np.array_equal(a, b)
    assert a.shape == (3, 32)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)
    assert not np.allclose(a[0], a[1])


def test_newline_scrub_matches_reference():
    # reference embeds text.replace("\n", " ") (src/rag/dataframes.rs:120)
    e = HashEmbedder(16)
    assert np.array_equal(
        e.embed_batch(["line one\nline two"]), e.embed_batch(["line one line two"])
    )


def test_http_embedder_is_stubbed():
    with pytest.raises(NotImplementedError):
        HttpEmbedder().embed_batch(["x"])


def test_with_embeddings_dataframe(spark):
    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "id long, body string"
    )
    out = with_embeddings(df, text_col="body", dim=8).collect()
    assert len(out) == 10
    assert all(len(r.embedding) == 8 for r in out)
    # row identity preserved, embedding deterministic across runs
    again = {r.id: r.embedding for r in with_embeddings(df, text_col="body", dim=8).collect()}
    for r in out:
        assert again[r.id] == r.embedding
