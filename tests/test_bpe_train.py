"""Distributed BPE training vs the sequential reference trace."""

from __future__ import annotations


def test_distributed_trace_matches_sequential(spark):
    """Merge-for-merge equality with functions/bpe.py::bpe_merge_trace on
    the fixture corpus — token bytes AND pair counts, in order."""
    import duckdb

    from signal_messenger_vector_database_spark.functions.bpe import bpe_merge_trace
    from signal_messenger_vector_database_spark.io.sources import load_table
    from signal_messenger_vector_database_spark.operators.bpe_train import (
        bpe_train_merges,
    )

    sf = "/root/testdata/sf0.001"
    got = bpe_train_merges(spark, load_table(spark, sf, "documents"), 16).collect()
    rows = duckdb.sql(
        f"SELECT text FROM '{sf}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    want = bpe_merge_trace([r[0] for r in rows], 16)
    assert [(r.rank, r.token, r.pair_count) for r in got] == [
        (i + 1, m.hex(), c) for i, (m, c) in enumerate(want)
    ]


def test_greedy_skip_after_merge_and_stop_rule(spark):
    """The fold must reproduce the trainer's skip-after-merge greedy scan
    (aaaa under merge (a,a) -> (aa)(aa), NOT three overlapping pairs) and
    training must stop when no pair reaches count 2."""
    from signal_messenger_vector_database_spark.functions.bpe import bpe_merge_trace
    from signal_messenger_vector_database_spark.operators.bpe_train import (
        bpe_train_merges,
    )

    # 'aaaa' x3: pair (a,a) has count 3*3=9; after merging, (aa,aa) count 3
    docs = spark.createDataFrame([("aaaa",), ("aaaa",), ("aaaa",)], "text string")
    got = bpe_train_merges(spark, docs, 8).collect()
    want = bpe_merge_trace(["aaaa"] * 3, 8)
    assert [(r.token, r.pair_count) for r in got] == [(m.hex(), c) for m, c in want]
    # first merge is (a,a) with SKIP semantics: count 9, not 9+overlaps
    assert got[0].token == (b"aa").hex() and got[0].pair_count == 9
    # stop rule: singleton pieces exhaust merges before the budget
    assert len(got) < 8


def test_trace_is_document_order_independent():
    """The property that justifies distribution: shuffling document order
    cannot change the trace."""
    from signal_messenger_vector_database_spark.functions.bpe import bpe_merge_trace

    texts = ["spark shuffles rows", "rows shuffle sparks", "the spark of rows"]
    assert bpe_merge_trace(texts, 8) == bpe_merge_trace(texts[::-1], 8)


def test_trained_merges_drive_the_encoder(spark):
    """Train→apply end-to-end: ranks built from the distributed trainer's
    merge table must drive functions/bpe.py's encoder exactly like ranks
    from the sequential trainer — and more merges can never increase a
    text's token count."""
    from signal_messenger_vector_database_spark.functions.bpe import (
        bpe_merge_trace,
        encode_count,
    )
    from signal_messenger_vector_database_spark.io.sources import load_table
    from signal_messenger_vector_database_spark.operators.bpe_train import (
        bpe_train_merges,
    )

    sf = "/root/testdata/sf0.001"
    got = bpe_train_merges(spark, load_table(spark, sf, "documents"), 16).collect()

    def ranks_from(trace_tokens):
        ranks = {bytes([b]): b for b in range(256)}
        for tok in trace_tokens:
            if tok not in ranks:
                ranks[tok] = len(ranks)
        return ranks

    distributed = ranks_from([bytes.fromhex(r.token) for r in got])
    import duckdb

    rows = duckdb.sql(
        f"SELECT text FROM '{sf}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    sequential = ranks_from([m for m, _ in bpe_merge_trace([r[0] for r in rows], 16)])
    assert distributed == sequential

    sample = [r[0] for r in rows[:25]]
    base_ranks = {bytes([b]): b for b in range(256)}
    for t in sample:
        n_trained = encode_count(t, distributed)
        n_bytes = encode_count(t, base_ranks)
        assert 0 < n_trained <= n_bytes  # merges only ever shrink counts
