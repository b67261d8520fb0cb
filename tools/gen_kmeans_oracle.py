"""Generate the corpus-keyed snapshot oracle for ``kmeans_fit_assign``
(VERDICT r10 #8 — the tokenize_cl100k / bpe_train pattern).

``kmeans_fit_assign`` runs the CONVERGED Lloyd loop (driver-side
iteration, early break on inertia) — not expressible as one SQL string,
so it was rows-only.  But its OUTPUT is deterministic per corpus:

* every centroid update averages the RAW float32 embedding components —
  each a multiple of 2^-37 with |value| < 0.5, so group sums of <= n
  such values are EXACT in doubles regardless of aggregation order
  (sum * 2^37 << 2^53), and the average is one division of exact
  operands — no partitioning or engine can perturb it;
* assignments and d2 are fixed left-to-right folds over those exact
  values — deterministic;
* the inertia-based early break compares differences ~1e-2 against
  tol * inertia — ulp-level jitter in the inertia SUM (the one
  order-sensitive double, used only for the break test) cannot flip a
  decision at fixture magnitudes.

So one full replay per fixture, keyed by a content statistic of the
embeddings table (COUNT(*) alone collides: sf0.001 and sf0.01 both
have 500 rows — the key mixes in the exact order-free SUM of first
components), is a valid oracle; the hostile local[3]/7-shuffle sweep
empirically re-verifies the order-independence claim every round.

Usage:  python tools/gen_kmeans_oracle.py      # rewrites the 3 TSVs
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the corpus-key expression, shared VERBATIM with the oracle SQL in
# plans/vectorops.py (imported from here — one definition)
KEY_SQL = (
    "SELECT CAST(COUNT(*) AS BIGINT) * 1000003 + "
    "CAST(FLOOR(ABS(SUM(embedding[1]::DOUBLE)) * 1000 + 0.5) AS BIGINT) "
    "FROM embeddings"
)


def corpus_key(sf_dir: str) -> int:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return int(con.execute(KEY_SQL).fetchone()[0])


def main() -> None:
    from signal_messenger_vector_database_spark.functions.bpe import _DATA_DIR
    from signal_messenger_vector_database_spark.plans.vectorops import (
        _kmeans_fit_assign,
    )
    from signal_messenger_vector_database_spark.session import get_spark

    spark = get_spark("gen-kmeans-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        key = corpus_key(sf_dir)
        rows = _kmeans_fit_assign(spark, sf_dir).collect()
        path = os.path.join(_DATA_DIR, f"kmeans_fit_{sf}.tsv")
        with open(path, "w") as f:
            f.write(f"# corpus_key={key}\n")
            for r in sorted(rows, key=lambda r: r.vec_id):
                # repr round-trips the double exactly; DuckDB parses the
                # decimal literal back to the identical double
                f.write(f"{r.vec_id}\t{r.cluster}\t{r.d2!r}\n")
        print(f"{path}: {len(rows)} rows, corpus_key={key}")


if __name__ == "__main__":
    main()
