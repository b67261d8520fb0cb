"""Precompute the tokenize_cl100k oracle snapshot (checked in).

Counts are computed by the PURE-PYTHON encoder (no Spark) over the sf0.01
documents parquet; the catalog embeds them as an inline VALUES table so
DuckDB can replay them.  The Spark query must reproduce these through the
distributed pandas-UDF path — the compare verifies the Spark plumbing,
while the encoder itself is unit-tested against hand-checkable merges.
Regenerate only when the vocabulary or fixture changes.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from signal_messenger_vector_database_spark.functions.bpe import (
    _DATA_DIR,
    encode_count,
    resolve_ranks,
)


def main() -> None:
    ranks = resolve_ranks()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        rows = duckdb.sql(
            f"SELECT doc_id, text FROM '/root/testdata/{sf}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
        # Bake the corpus key (SUM(n_chars), the discriminator the oracle
        # SQL matches on) into the snapshot header, so building the oracle
        # SQL needs NO fixture I/O — previously the catalog scanned all
        # three parquet fixtures at import time (ADVICE r7 medium).
        key = duckdb.sql(
            f"SELECT SUM(n_chars) FROM '/root/testdata/{sf}/documents.parquet'"
        ).fetchone()[0]
        out = os.path.join(_DATA_DIR, f"tokenize_cl100k_{sf}.tsv")
        with open(out, "w") as f:
            f.write(f"# corpus_key={key}\n")
            for doc_id, text in rows:
                f.write(f"{doc_id}\t{encode_count(text, ranks)}\n")
        print(f"wrote {len(rows)} rows to {out} (corpus_key={key})")


if __name__ == "__main__":
    main()
