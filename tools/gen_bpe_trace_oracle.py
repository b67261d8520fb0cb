"""Precompute the bpe_train oracle snapshots (checked in).

The merge trace is computed by the SEQUENTIAL pure-Python reference
(functions/bpe.py::bpe_merge_trace, no Spark) over each fixture's
documents; the catalog embeds the traces as an inline VALUES table
keyed by the corpus's character mass (the tokenize_cl100k pattern —
the key is baked into the header so building the oracle SQL needs no
fixture I/O).  The Spark query must reproduce the trace through the
distributed piece-frequency + driver-looped argmax path.  Regenerate
only when the trainer or fixtures change.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from signal_messenger_vector_database_spark.functions.bpe import (
    _DATA_DIR,
    bpe_merge_trace,
)

N_MERGES = 16


def main() -> None:
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        src = f"/root/testdata/{sf}/documents.parquet"
        rows = duckdb.sql(f"SELECT text FROM '{src}' ORDER BY doc_id").fetchall()
        key = duckdb.sql(f"SELECT SUM(n_chars) FROM '{src}'").fetchone()[0]
        trace = bpe_merge_trace([r[0] for r in rows], N_MERGES)
        out = os.path.join(_DATA_DIR, f"bpe_trace_{sf}.tsv")
        with open(out, "w") as f:
            f.write(f"# corpus_key={key}\n")
            for rank, (merged, count) in enumerate(trace, 1):
                f.write(f"{rank}\t{merged.hex()}\t{count}\n")
        print(f"wrote {len(trace)} merges to {out} (corpus_key={key})")


if __name__ == "__main__":
    main()
