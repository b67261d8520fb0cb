"""Byte-level BPE tokenizer with cl100k_base semantics (T1 parity path).

The reference counts prompt tokens with the cl100k_base BPE
(src/rag/dataframes.rs:32-39, tiktoken-rs ``num_tokens_from_str``).  This
module implements the SAME algorithm — regex pre-tokenization with the
public cl100k split pattern, then greedy lowest-rank byte-pair merging
against a mergeable-ranks table — as pure Python over the standard
``.tiktoken`` file format (``base64(token) rank`` per line).

The cl100k_base ranks FILE (~1.7 MB of data, not code) is not shipped in
this container and cannot be fabricated, so vocabulary resolution is:

1. ``$SMVD_TIKTOKEN_FILE`` — a real ``cl100k_base.tiktoken`` if the
   deployment has one: counts are then exactly the reference's.
2. The vendored ``data/mini_bpe.tiktoken`` — a small ranks table trained
   by ``train_bpe`` (classic pair-frequency BPE) on the sf0.01 documents
   fixture, checked in for determinism.  Same file format, same encoder,
   same pre-tokenizer; only the ranks differ.

Everything here is driver/executor-side Python invoked through
Arrow-batched pandas UDFs — never per-row registered UDFs.
"""

from __future__ import annotations

import base64
import os
from collections import Counter
from functools import lru_cache

import pandas as pd

# Public cl100k_base split pattern (openai/tiktoken, MIT).  Requires the
# third-party ``regex`` module for \p classes + possessive quantifiers.
CL100K_PATTERN = (
    r"""'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}"""
    r"""| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""
)

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
MINI_BPE_PATH = os.path.join(_DATA_DIR, "mini_bpe.tiktoken")


def load_tiktoken_ranks(path: str) -> dict[bytes, int]:
    """Parse the standard ``.tiktoken`` format: one ``base64(token) rank``
    pair per line (identical to cl100k_base.tiktoken's layout)."""
    ranks: dict[bytes, int] = {}
    with open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            tok_b64, rank = line.split()
            ranks[base64.b64decode(tok_b64)] = int(rank)
    return ranks


def save_tiktoken_ranks(ranks: dict[bytes, int], path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        for tok, rank in sorted(ranks.items(), key=lambda kv: kv[1]):
            f.write(base64.b64encode(tok) + b" " + str(rank).encode() + b"\n")


@lru_cache(maxsize=4)
def resolve_ranks(path: str | None = None) -> dict[bytes, int]:
    """Vocabulary resolution order documented in the module docstring.

    When the vocab comes through the ``$SMVD_TIKTOKEN_FILE`` seam, its
    content hash is pinned by ``$SMVD_TIKTOKEN_SHA256``: a wrong or
    truncated vocab file silently shifts EVERY token count downstream
    (packing, chunking, quality scores), so the mismatch must fail
    loudly at load, not surface as drifted numbers later."""
    env_path = os.environ.get("SMVD_TIKTOKEN_FILE")
    path = path or env_path or MINI_BPE_PATH
    if env_path and path == env_path:
        expected = os.environ.get("SMVD_TIKTOKEN_SHA256", "").strip().lower()
        if expected:
            import hashlib

            with open(path, "rb") as f:
                actual = hashlib.sha256(f.read()).hexdigest()
            if actual != expected:
                raise ValueError(
                    f"SMVD_TIKTOKEN_FILE checksum mismatch for {path}: "
                    f"sha256={actual}, expected {expected} "
                    "(set SMVD_TIKTOKEN_SHA256 to the correct digest or fix the file)"
                )
    return load_tiktoken_ranks(path)


def bpe_parts(piece: bytes, ranks: dict[bytes, int]) -> list[bytes]:
    """Greedy lowest-rank adjacent-pair merging — the tiktoken merge loop.

    Start from single bytes; repeatedly merge the adjacent pair with the
    lowest rank present in the table until no adjacent pair is mergeable.
    The result is the token byte-partition of ``piece``."""
    if piece in ranks or len(piece) <= 1:
        return [piece]
    parts = [piece[i : i + 1] for i in range(len(piece))]
    while len(parts) > 1:
        best_rank: int | None = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get(parts[i] + parts[i + 1])
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def encode_count(text: str, ranks: dict[bytes, int] | None = None) -> int:
    """Token COUNT under the cl100k algorithm (the reference only ever
    needs the count — num_tokens_from_str)."""
    import regex

    ranks = ranks if ranks is not None else resolve_ranks()
    n = 0
    for m in regex.finditer(CL100K_PATTERN, text):
        n += len(bpe_parts(m.group().encode("utf-8"), ranks))
    return n


def train_bpe(
    texts: list[str], n_merges: int = 768, pattern: str = CL100K_PATTERN
) -> dict[bytes, int]:
    """Classic BPE training: 256 byte tokens, then ``n_merges`` rounds of
    merging the most frequent adjacent pair within pre-tokenized pieces
    (ties broken lexicographically for determinism).  Small-corpus trainer
    for the vendored vocabulary — NOT a reimplementation of cl100k's
    training run, which is not public."""
    import regex

    ranks: dict[bytes, int] = {bytes([b]): b for b in range(256)}
    # corpus as piece -> frequency, each piece a tuple of current parts
    corpus: Counter[tuple[bytes, ...]] = Counter()
    for t in texts:
        for m in regex.finditer(pattern, t):
            piece = m.group().encode("utf-8")
            corpus[tuple(piece[i : i + 1] for i in range(len(piece)))] += 1

    for _ in range(n_merges):
        pair_freq: Counter[tuple[bytes, bytes]] = Counter()
        for parts, freq in corpus.items():
            for i in range(len(parts) - 1):
                pair_freq[(parts[i], parts[i + 1])] += freq
        if not pair_freq:
            break
        (a, b), freq = min(
            pair_freq.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < 2:
            break
        merged = a + b
        if merged not in ranks:
            # (a different split of the same byte string may already be a
            # token; the corpus merge below still applies either way)
            ranks[merged] = len(ranks)
        new_corpus: Counter[tuple[bytes, ...]] = Counter()
        for parts, f in corpus.items():
            out: list[bytes] = []
            i = 0
            while i < len(parts):
                if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            new_corpus[tuple(out)] += f
        corpus = new_corpus
    return ranks


def bpe_token_count_column(col, ranks_path: str | None = None):
    """Arrow-batched pandas UDF computing cl100k-algorithm token counts.

    The ranks table resolves once per executor (lru_cache) — only the
    path string is captured in the closure, not the table itself."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _count(texts: pd.Series) -> pd.Series:
        ranks = resolve_ranks(ranks_path)
        return texts.map(lambda t: encode_count(t, ranks) if t is not None else None)

    return _count(col)


def bpe_merge_trace(
    texts: list[str], n_merges: int = 16, pattern: str = CL100K_PATTERN
) -> list[tuple[bytes, int]]:
    """The TRACE of a BPE training run: [(merged_token_bytes, pair_count)]
    in merge order.  Same algorithm and tie-break as :func:`train_bpe`
    ((-count, left, right) — count desc, then lexicographic on the raw
    bytes), exposed as a sequence so the distributed trainer
    (operators/bpe_train.py) can be verified merge-for-merge against this
    sequential reference.  Order-independent in the input texts: the
    piece-frequency Counter erases document order, which is exactly what
    makes the computation distributable."""
    import regex

    corpus: Counter[tuple[bytes, ...]] = Counter()
    for t in texts:
        for m in regex.finditer(pattern, t or ""):
            piece = m.group().encode("utf-8")
            corpus[tuple(piece[i : i + 1] for i in range(len(piece)))] += 1

    trace: list[tuple[bytes, int]] = []
    for _ in range(n_merges):
        pair_freq: Counter[tuple[bytes, bytes]] = Counter()
        for parts, freq in corpus.items():
            for i in range(len(parts) - 1):
                pair_freq[(parts[i], parts[i + 1])] += freq
        if not pair_freq:
            break
        (a, b), freq = min(
            pair_freq.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < 2:
            break
        merged = a + b
        trace.append((merged, freq))
        new_corpus: Counter[tuple[bytes, ...]] = Counter()
        for parts, f in corpus.items():
            out: list[bytes] = []
            i = 0
            while i < len(parts):
                if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            new_corpus[tuple(out)] += f
        corpus = new_corpus
    return trace
