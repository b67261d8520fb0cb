"""HttpEmbedder end-to-end against a REAL socket (VERDICT r9 #7).

Every prior HttpEmbedder test drove the request-build/parse/retry code
through an injected in-process transport; this module stands up an
actual Ollama-shaped HTTP endpoint (ThreadingHTTPServer on a loopback
ephemeral port, serving deterministic md5-derived vectors) and runs

  1. the embedder directly (urllib transport, real TCP),
  2. the full Spark ``with_embeddings`` mapInPandas path — the client
     is constructed per Python WORKER and calls back into the server
     from the executor side, exactly the production topology,
  3. the retry loop against a server that 500s the first attempt per
     prompt — backoff + re-POST over a real connection.

No external service and no env gate: the server lives inside the test
process.  ``$SMVD_EMBED_URL`` still gates any test that needs a REAL
Ollama (none here).
"""

from __future__ import annotations

import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

DIM = 8


def _vec_for(prompt: str) -> list[float]:
    """Deterministic per-prompt vector: byte pairs of md5(prompt)."""
    h = hashlib.md5(prompt.encode("utf-8")).hexdigest()
    return [int(h[2 * j : 2 * j + 2], 16) / 256.0 for j in range(DIM)]


class _Handler(BaseHTTPRequestHandler):
    fail_first = False
    fixed_response: bytes | None = None  # verbatim bytes (fixture replay)
    seen: dict[str, int] = {}
    lock = threading.Lock()

    def do_POST(self):  # noqa: N802 — http.server API
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        prompt = body["prompt"]
        with _Handler.lock:
            n = _Handler.seen.get(prompt, 0)
            _Handler.seen[prompt] = n + 1
        if _Handler.fail_first and n == 0:
            self.send_response(500)
            self.end_headers()
            return
        out = _Handler.fixed_response or json.dumps(
            {"embedding": _vec_for(prompt)}
        ).encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence per-request stderr lines
        pass


@pytest.fixture()
def embed_server():
    _Handler.fail_first = False
    _Handler.fixed_response = None
    _Handler.seen = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}/api/embeddings"
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_embedder_direct_over_socket(embed_server):
    from signal_messenger_vector_database_spark.operators.embed import (
        HttpEmbedder,
    )

    e = HttpEmbedder(url=embed_server, dim=DIM)
    got = e.embed_batch(["hello world", "second prompt"])
    assert got.shape == (2, DIM)
    np.testing.assert_allclose(got[0], _vec_for("hello world"), rtol=1e-6)
    np.testing.assert_allclose(got[1], _vec_for("second prompt"), rtol=1e-6)


def test_http_embedder_scrubs_newlines_before_post(embed_server):
    from signal_messenger_vector_database_spark.operators.embed import (
        HttpEmbedder,
    )

    e = HttpEmbedder(url=embed_server, dim=DIM)
    got = e.embed_batch(["line one\nline two"])
    # P5: the server must have SEEN the scrubbed prompt (reference
    # text.replace('\n', ' '), src/rag/dataframes.rs:120)
    assert "line one line two" in _Handler.seen
    np.testing.assert_allclose(got[0], _vec_for("line one line two"), rtol=1e-6)


def test_http_embedder_retries_over_socket(embed_server):
    from signal_messenger_vector_database_spark.operators.embed import (
        HttpEmbedder,
    )

    _Handler.fail_first = True
    sleeps: list[float] = []
    e = HttpEmbedder(
        url=embed_server, dim=DIM, backoff_s=0.01, sleep=sleeps.append
    )
    got = e.embed_batch(["flaky prompt"])
    np.testing.assert_allclose(got[0], _vec_for("flaky prompt"), rtol=1e-6)
    assert _Handler.seen["flaky prompt"] == 2  # 500 then 200
    assert sleeps == [0.01]  # one backoff before the retry


def test_with_embeddings_http_path_from_executors(spark, embed_server):
    """The full Arrow path: mapInPandas constructs one HttpEmbedder per
    Python worker and POSTs per prompt from the EXECUTOR side; results
    come back through the Arrow batch as array<float>."""
    from pyspark.sql import functions as F

    from signal_messenger_vector_database_spark.operators.embed import (
        HttpEmbedder,
        with_embeddings,
    )

    url = embed_server
    df = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(12)], "id long, body string"
    ).repartition(3)
    out = with_embeddings(
        df,
        text_col="body",
        out_col="embedding",
        dim=DIM,
        embedder_factory=lambda: HttpEmbedder(url=url, dim=DIM),
    )
    rows = {r.id: list(r.embedding) for r in out.collect()}
    assert len(rows) == 12
    for i in range(12):
        np.testing.assert_allclose(
            rows[i], _vec_for(f"doc number {i}"), rtol=1e-6
        )
    # every prompt hit the real server exactly once — counts too, so a
    # double-POST regression cannot hide behind a key-set compare
    assert sorted(_Handler.seen) == sorted(f"doc number {i}" for i in range(12))
    assert all(v == 1 for v in _Handler.seen.values()), _Handler.seen


def test_http_embedder_parses_vendored_ollama_response(embed_server):
    """VERDICT r11 #6: replay the vendored 768-d Ollama response fixture
    VERBATIM through the full urllib transport + parse path.  The
    loopback server serves the fixture's exact bytes (only the
    ``embedding`` key, as Ollama sends), so request build, real TCP,
    JSON decode, dim validation, and float32 conversion all run against
    the pinned on-the-wire shape — the one remaining un-exercised piece
    of the reference's embed behavior is the live network itself.  The
    fixture's _meta records whether it was recorded live or synthesized
    to the public schema (this sandbox has no network; re-record with
    SMVD_EMBED_URL set via tools/gen_ollama_fixture.py)."""
    import os

    from signal_messenger_vector_database_spark.functions.bpe import _DATA_DIR
    from signal_messenger_vector_database_spark.operators.embed import (
        HttpEmbedder,
    )

    with open(os.path.join(_DATA_DIR, "ollama_embeddings_response.json")) as f:
        fixture = json.load(f)
    vec = fixture["embedding"]
    assert fixture["_meta"]["dim"] == len(vec) == 768

    _Handler.fixed_response = json.dumps({"embedding": vec}).encode()
    try:
        e = HttpEmbedder(url=embed_server)  # defaults: nomic shape, dim=768
        got = e.embed_batch([fixture["_meta"]["prompt"]])
    finally:
        _Handler.fixed_response = None
    assert got.shape == (1, 768) and got.dtype == np.float32
    np.testing.assert_array_equal(got[0], np.asarray(vec, dtype=np.float32))
    # a wrong-dim response must FAIL the dim validation, not truncate
    _Handler.fixed_response = json.dumps({"embedding": vec[:767]}).encode()
    try:
        bad = HttpEmbedder(
            url=embed_server, max_retries=1, backoff_s=0, sleep=lambda s: None
        )
        with pytest.raises(RuntimeError):
            bad.embed_batch(["x"])
    finally:
        _Handler.fixed_response = None
