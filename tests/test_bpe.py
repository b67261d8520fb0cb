"""cl100k-algorithm BPE engine (functions/bpe.py) — T1 parity path.

Reference semantics: src/rag/dataframes.rs:32-39 counts cl100k_base
tokens via tiktoken-rs.  The engine is tested on hand-computable merge
sequences (vocabulary-independent), the .tiktoken wire format, the
trainer's determinism, and Spark-vs-pure-Python parity; with a real
cl100k_base.tiktoken on $SMVD_TIKTOKEN_FILE the last test pins known
cl100k counts.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.functions.bpe import (
    CL100K_PATTERN,
    bpe_parts,
    bpe_token_count_column,
    encode_count,
    load_tiktoken_ranks,
    resolve_ranks,
    save_tiktoken_ranks,
    train_bpe,
)

BYTES = {bytes([b]): b for b in range(256)}


def test_merge_order_follows_ranks_not_position():
    # ranks: "ab" cheaper than "bc" => "abc" merges left pair first, and
    # "abc" itself is then a token only if present in the table.
    ranks = dict(BYTES)
    ranks[b"ab"] = 256
    ranks[b"bc"] = 257
    assert bpe_parts(b"abc", ranks) == [b"ab", b"c"]
    ranks2 = dict(ranks)
    ranks2[b"abc"] = 258
    assert bpe_parts(b"abc", ranks2) == [b"abc"]
    # lowest rank wins even when it appears later in the byte string
    ranks3 = dict(BYTES)
    ranks3[b"bc"] = 256
    ranks3[b"ab"] = 257
    assert bpe_parts(b"abc", ranks3) == [b"a", b"bc"]


def test_pretokenizer_splits_match_cl100k_classes():
    import regex

    pieces = regex.findall(CL100K_PATTERN, "don't count 1234 spaces  now")
    # contraction split, 3-digit number chunking, space-prefixed words
    assert "'t" in pieces
    assert "123" in pieces and "4" in pieces
    assert " count" in pieces


def test_tiktoken_format_roundtrip(tmp_path):
    ranks = train_bpe(["aa bb aa bb aa"], n_merges=8)
    p = tmp_path / "mini.tiktoken"
    save_tiktoken_ranks(ranks, str(p))
    assert load_tiktoken_ranks(str(p)) == ranks


def test_trainer_is_deterministic_and_learns_frequent_pairs():
    corpus = ["the cat sat on the mat"] * 5 + ["the dog"] * 3
    r1 = train_bpe(corpus, n_merges=32)
    r2 = train_bpe(corpus, n_merges=32)
    assert r1 == r2
    assert b"the" in r1  # most frequent word becomes a token
    # counts shrink monotonically vs bytes-only
    assert encode_count("the cat", r1) < len(b"the cat")


def test_vendored_vocab_loads_and_counts():
    ranks = resolve_ranks()
    assert len(ranks) > 256
    assert encode_count("", ranks) == 0
    assert encode_count("a", ranks) == 1


def test_spark_udf_matches_pure_python(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", bpe_token_count_column(F.col("text")).alias("n")
        ).collect()
    }
    ranks = resolve_ranks()
    for r in docs.collect():
        assert got[r.doc_id] == encode_count(r.text, ranks)


@pytest.mark.skipif(
    not os.environ.get("SMVD_TIKTOKEN_FILE"),
    reason="real cl100k_base.tiktoken not available in this container",
)
def test_real_cl100k_known_counts():
    ranks = load_tiktoken_ranks(os.environ["SMVD_TIKTOKEN_FILE"])
    # pinned counts from the published cl100k_base vocabulary
    assert encode_count("hello world", ranks) == 2
    assert encode_count("tiktoken is great!", ranks) == 6


def test_tiktoken_env_file_checksum_pin(tmp_path, monkeypatch):
    """$SMVD_TIKTOKEN_SHA256 pins the content of $SMVD_TIKTOKEN_FILE:
    correct digest loads, wrong digest fails loudly (a wrong vocab would
    silently shift every token count downstream)."""
    import hashlib

    import pytest

    from signal_messenger_vector_database_spark.functions.bpe import (
        MINI_BPE_PATH,
        resolve_ranks,
    )

    vocab = tmp_path / "v.tiktoken"
    vocab.write_bytes(open(MINI_BPE_PATH, "rb").read())
    good = hashlib.sha256(vocab.read_bytes()).hexdigest()

    monkeypatch.setenv("SMVD_TIKTOKEN_FILE", str(vocab))
    monkeypatch.setenv("SMVD_TIKTOKEN_SHA256", good)
    resolve_ranks.cache_clear()
    assert resolve_ranks()  # loads fine under the correct pin

    monkeypatch.setenv("SMVD_TIKTOKEN_SHA256", "0" * 64)
    resolve_ranks.cache_clear()
    with pytest.raises(ValueError, match="checksum mismatch"):
        resolve_ranks()
    resolve_ranks.cache_clear()  # don't leak the poisoned cache entry
