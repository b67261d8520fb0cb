"""E1 — text -> embedding, Arrow-batched.

The reference embeds ROW-AT-A-TIME over HTTP: one POST to Ollama
(nomic-embed-text, 768-d) per message (``get_embeddings_from_ollama``,
src/rag/dataframes.rs:113-151), the N+1 pattern that defines its throughput
ceiling (BASELINE.md).  Here embedding is a ``mapInPandas`` stage: Arrow
batches of texts per partition, client/model initialized once per executor,
so at 100 TB the embed cost is (rows / batch) round-trips spread over every
executor instead of rows serial round-trips on one thread.

Two embedders:

- ``HashEmbedder`` — deterministic, dependency-free mock (seeded from
  sha256 of the normalized text) used for tests/goldens, mirroring SURVEY
  §5's 'deterministic mock embedder' strategy.
- ``HttpEmbedder`` — the real client shape (Ollama-compatible endpoint);
  the network call is stubbed with NotImplementedError in this offline
  environment, but batching, retry seams, and partition plumbing are real.

Both normalize newlines to spaces first, exactly like the reference
(``text.replace("\\n", " ")``, src/rag/dataframes.rs:120 — P5).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType


def _scrub(text: str | None) -> str:
    return ("" if text is None else text).replace("\n", " ")


class HashEmbedder:
    """Deterministic unit-norm vector derived from the text bytes.

    One shake_256 XOF call per row (dim*4 bytes), bytes -> uint32 ->
    [-1, 1) floats -> L2-normalize.  ~micro-seconds per row; no RNG-object
    construction in the loop."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        nbytes = self.dim * 4
        raw = np.empty((len(texts), self.dim), dtype=np.uint32)
        for i, t in enumerate(texts):
            digest = hashlib.shake_256(_scrub(t).encode("utf-8")).digest(nbytes)
            raw[i] = np.frombuffer(digest, dtype=np.uint32)
        v = (raw.astype(np.float64) / 2147483648.0) - 1.0
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return (v / norms).astype(np.float32)


class HttpEmbedder:
    """Ollama-compatible batched HTTP embedder (reference endpoint shape:
    POST {url}/api/embeddings {"model": ..., "prompt": ...},
    src/rag/dataframes.rs:114-128).  Offline here -> NotImplementedError,
    but the mapInPandas integration (per-executor client, batch loop) is
    the real production shape."""

    def __init__(self, url: str = "http://localhost:11434/api/embeddings",
                 model: str = "nomic-embed-text", dim: int = 768):
        self.url, self.model, self.dim = url, model, dim

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        raise NotImplementedError(
            "no embedding service in this environment; swap in HashEmbedder "
            "or deploy an Ollama-compatible endpoint"
        )


def with_embeddings(
    df: DataFrame,
    text_col: str = "body",
    out_col: str = "embedding",
    dim: int = 64,
    embedder_factory=None,
    batch_rows: int = 1024,
) -> DataFrame:
    """Append ``out_col: array<float>`` computed in Arrow batches.

    ``embedder_factory`` is constructed ONCE PER PYTHON WORKER (init-once
    per executor — contrast the reference rebuilding its BPE per call,
    src/rag/dataframes.rs:37, and opening per-row HTTP connections).
    """
    factory = embedder_factory or (lambda: HashEmbedder(dim))
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(FloatType()), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        embedder = factory()
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                part = pdf.iloc[start : start + batch_rows].copy()
                vecs = embedder.embed_batch(part[text_col].tolist())
                part[out_col] = list(vecs)
                yield part

    return df.mapInPandas(run, schema=out_schema)


def embed_pipeline_repartitioned(df: DataFrame, target_partitions: int, **kw) -> DataFrame:
    """Scale path: repartition before the embed stage to bound per-task batch
    size / parallelize over all executors (SURVEY §4 'repartition before
    embed stage')."""
    return with_embeddings(df.repartition(target_partitions), **kw)
