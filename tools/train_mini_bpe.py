"""Regenerate the vendored mini BPE ranks table (data/mini_bpe.tiktoken).

Deterministic: trained on the sf0.01 documents fixture text ordered by
doc_id, 768 merges, lexicographic tie-breaks.  Run only when the trainer
or fixture changes; the output file is checked in.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from signal_messenger_vector_database_spark.functions.bpe import (
    MINI_BPE_PATH,
    save_tiktoken_ranks,
    train_bpe,
)


def main() -> None:
    rows = duckdb.sql(
        "SELECT text FROM '/root/testdata/sf0.01/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    ranks = train_bpe([r[0] for r in rows], n_merges=768)
    save_tiktoken_ranks(ranks, MINI_BPE_PATH)
    print(f"wrote {len(ranks)} ranks to {MINI_BPE_PATH}")


if __name__ == "__main__":
    main()
