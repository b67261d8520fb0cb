"""E1 embed stage: determinism, batching, newline scrub (P5)."""

from __future__ import annotations

import os

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


class _RecordedTransport:
    """Canned-JSON fake of the Ollama /api/embeddings endpoint shape
    (src/rag/dataframes.rs:114-128): request {"model","prompt"}, response
    {"embedding": [...]} — optionally failing the first N calls."""

    def __init__(self, dim: int = 4, fail_first: int = 0):
        self.dim = dim
        self.fail_first = fail_first
        self.requests: list[dict] = []

    def __call__(self, payload: dict) -> dict:
        self.requests.append(payload)
        if len(self.requests) <= self.fail_first:
            raise ConnectionError("recorded transient fault")
        # deterministic vector derived from the prompt, Ollama shape
        seed = sum(payload["prompt"].encode()) or 1
        return {"embedding": [float(seed % (i + 2)) for i in range(self.dim)]}


def test_http_embedder_recorded_roundtrip():
    t = _RecordedTransport(dim=4)
    e = HttpEmbedder(dim=4, transport=t)
    out = e.embed_batch(["hello\nworld", "second"])
    assert out.shape == (2, 4) and out.dtype == np.float32
    # request shape matches the reference's Ollama payload, newline-scrubbed
    assert t.requests[0] == {"model": "nomic-embed-text", "prompt": "hello world"}
    assert len(t.requests) == 2


def test_http_embedder_retries_then_succeeds():
    slept = []
    t = _RecordedTransport(dim=4, fail_first=2)
    e = HttpEmbedder(dim=4, transport=t, max_retries=3, sleep=slept.append)
    out = e.embed_batch(["x"])
    assert out.shape == (1, 4)
    assert len(t.requests) == 3  # 2 failures + 1 success
    assert slept == [0.5, 1.0]  # exponential backoff


def test_http_embedder_exhausted_retries_raise():
    t = _RecordedTransport(dim=4, fail_first=99)
    e = HttpEmbedder(dim=4, transport=t, max_retries=2, sleep=lambda s: None)
    with pytest.raises(RuntimeError, match="after 2 attempts"):
        e.embed_batch(["x"])


def test_http_embedder_rejects_wrong_dim():
    t = _RecordedTransport(dim=3)
    e = HttpEmbedder(dim=768, transport=t, max_retries=1, sleep=lambda s: None)
    with pytest.raises(RuntimeError):
        e.embed_batch(["x"])


def test_http_embedder_through_spark_pipeline(spark):
    """The full mapInPandas embed stage with the recorded transport — the
    production HTTP path minus only the socket."""
    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "id long, body string"
    )

    # defined locally so cloudpickle ships it by value to Python workers
    def canned_transport(payload: dict) -> dict:
        seed = sum(payload["prompt"].encode()) or 1
        return {"embedding": [float(seed % (i + 2)) for i in range(4)]}

    out = with_embeddings(
        df,
        dim=4,
        embedder_factory=lambda: HttpEmbedder(dim=4, transport=canned_transport),
    ).collect()
    assert len(out) == 6
    assert all(len(r.embedding) == 4 for r in out)


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


class _FlakyOllamaHandler:
    """Stands up a REAL localhost HTTP server (r3 task 8: the retry loop
    was only ever exercised against recorded responses): first
    ``fail_first`` POSTs return 500, then valid Ollama-shaped JSON."""

    @staticmethod
    def make(fail_first: int, dim: int):
        import json
        from http.server import BaseHTTPRequestHandler

        state = {"calls": 0, "bodies": []}

        class H(BaseHTTPRequestHandler):
            def do_POST(self):
                state["calls"] += 1
                body = self.rfile.read(int(self.headers["Content-Length"]))
                state["bodies"].append(json.loads(body))
                if state["calls"] <= fail_first:
                    self.send_response(500)
                    self.end_headers()
                    self.wfile.write(b"boom")
                    return
                out = json.dumps({"embedding": [0.125] * dim}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

            def log_message(self, *a):  # keep pytest output clean
                pass

        return H, state


def _serve(handler):
    import threading
    from http.server import HTTPServer

    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/api/embeddings"


def test_http_embedder_live_retry_then_success():
    from signal_messenger_vector_database_spark.operators.embed import HttpEmbedder

    handler, state = _FlakyOllamaHandler.make(fail_first=2, dim=4)
    srv, url = _serve(handler)
    try:
        sleeps = []
        emb = HttpEmbedder(
            url=url, model="m", dim=4, max_retries=3, backoff_s=0.5,
            sleep=sleeps.append,
        )
        vecs = emb.embed_batch(["hello\nworld"])
        assert vecs.shape == (1, 4) and abs(float(vecs[0][0]) - 0.125) < 1e-7
        assert state["calls"] == 3  # 2 live 500s + 1 success over the socket
        assert sleeps == [0.5, 1.0]  # exponential backoff schedule
        # newline scrub (P5) applied before the request left the process
        assert state["bodies"][0]["prompt"] == "hello world"
    finally:
        srv.shutdown()


def test_http_embedder_live_exhausted_retries_raise():
    import pytest

    from signal_messenger_vector_database_spark.operators.embed import HttpEmbedder

    handler, state = _FlakyOllamaHandler.make(fail_first=99, dim=4)
    srv, url = _serve(handler)
    try:
        emb = HttpEmbedder(
            url=url, model="m", dim=4, max_retries=3, backoff_s=0.01,
            sleep=lambda s: None,
        )
        with pytest.raises(RuntimeError, match="after 3 attempts"):
            emb.embed_batch(["x"])
        assert state["calls"] == 3
    finally:
        srv.shutdown()


@pytest.mark.skipif(
    not os.environ.get("SMVD_EMBED_URL"),
    reason="no live embedding endpoint ($SMVD_EMBED_URL unset)",
)
def test_http_embedder_against_real_endpoint(spark):
    """End-to-end against a REAL Ollama-compatible endpoint (VERDICT r7
    task 6): the only seam the recorded-response and loopback-socket
    tests cannot cover is a genuine third-party server.  Gated on
    $SMVD_EMBED_URL (optionally $SMVD_EMBED_MODEL / $SMVD_EMBED_DIM,
    defaults matching the reference's nomic-embed-text/768,
    src/rag/dataframes.rs:113-151); skipped in containers without a
    service, runs on any cluster where one is reachable."""
    from pyspark.sql import functions as F

    from signal_messenger_vector_database_spark.operators.embed import (
        HttpEmbedder,
        with_embeddings,
    )

    url = os.environ["SMVD_EMBED_URL"]
    model = os.environ.get("SMVD_EMBED_MODEL", "nomic-embed-text")
    dim = int(os.environ.get("SMVD_EMBED_DIM", "768"))

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "a delivery receipt arrived\ntoday")],
        "id long, body string",
    )
    out = with_embeddings(
        df,
        text_col="body",
        dim=dim,
        embedder_factory=lambda: HttpEmbedder(url=url, model=model, dim=dim),
    )
    rows = out.orderBy("id").collect()
    assert [r.id for r in rows] == [1, 2]
    for r in rows:
        assert len(r.embedding) == dim
        # a real model returns a non-degenerate vector
        assert any(abs(x) > 1e-8 for x in r.embedding)
    # determinism across calls is NOT asserted (real services may not be);
    # schema and dim are the contract.
    assert dict(out.dtypes)["embedding"] == "array<float>"
