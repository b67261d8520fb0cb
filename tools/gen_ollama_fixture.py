"""Vendor an Ollama ``/api/embeddings`` response fixture (VERDICT r11 #6).

The reference's embed client POSTs ``{"model": "nomic-embed-text",
"prompt": ...}`` and parses ``{"embedding": [768 floats]}``
(src/rag/dataframes.rs:113-151).  ``HttpEmbedder`` replays that parse
path; this tool pins the exact on-the-wire RESPONSE BYTES it must
handle as a committed fixture, replayed verbatim through the loopback
HTTP server in tests/test_http_embedder_live.py — so the only part of
the reference's embed behavior never exercised is the live network
itself.

Two modes:

* ``$SMVD_EMBED_URL`` set (a machine with a real Ollama): POST the
  pinned prompt and record the genuine response bytes — a true
  recording.
* unset (this sandbox has no network): synthesize a response that is
  byte-faithful to the PUBLIC API schema — a single ``embedding`` key,
  768 unnormalized doubles at JSON full precision, magnitudes matching
  the model card's output scale.  The fixture file's ``_meta`` sidecar
  key (stripped before serving — Ollama sends only ``embedding``)
  records which mode produced it, so nobody mistakes the synthetic one
  for a live capture.

Usage: python tools/gen_ollama_fixture.py   # rewrites the fixture
"""

from __future__ import annotations

import hashlib
import json
import os

PROMPT = "What is the capital of France?"  # the reference's question #1
DIM = 768
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "signal_messenger_vector_database_spark",
    "data",
    "ollama_embeddings_response.json",
)


def synthesize() -> dict:
    """Deterministic 768-d vector in the model's output regime:
    md5-derived uniforms scaled to ~N(0, 0.35)-ish magnitudes, full
    double precision (the parse path must survive 17-digit literals)."""
    vec = []
    for i in range(DIM):
        h = hashlib.md5(f"{PROMPT}:{i}".encode()).hexdigest()
        u = int(h[:13], 16) / 16**13  # [0, 1) with 52 random bits
        vec.append((u - 0.5) * 1.4)
    return {"embedding": vec}


def record(url: str) -> dict:
    import urllib.request

    req = urllib.request.Request(
        url,
        data=json.dumps(
            {"model": "nomic-embed-text", "prompt": PROMPT}
        ).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read().decode())


def main() -> None:
    url = os.environ.get("SMVD_EMBED_URL")
    if url:
        body, mode = record(url), "recorded-live"
    else:
        body, mode = synthesize(), "synthesized-to-public-schema"
    vec = body["embedding"]
    assert len(vec) == DIM, f"expected {DIM}-d, got {len(vec)}"
    out = {"_meta": {"mode": mode, "prompt": PROMPT, "dim": DIM}, **body}
    with open(OUT, "w") as f:
        json.dump(out, f)
    print(f"{OUT}: dim={len(vec)} mode={mode}")


if __name__ == "__main__":
    main()
