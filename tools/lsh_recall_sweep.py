"""LSH recall-vs-cost sweep at 16x sf0.1 (VERDICT r7 task 5).

r7 shipped the analytic ``lsh_geometry`` with target_recall=0.45 and
measured 0.508 at 16x — a weak operating point.  This sweep measures a
(planes x tables) grid at 16x so the default can be picked from DATA:
for each geometry it runs ``lsh_cosine_pairs`` over the 32k decorrelated
replica vectors and reports wall time, candidate-pair volume, and recall
against derivable ground truth.

Ground truth: the probe replicas ROTATE each embedding by the replica
index (tools/scaling_probe.py), which preserves every intra-replica
cosine, so the true 16x pair set is exactly the 16 offset copies of the
1x exact pair set (computed once here with ``exact_cosine_pairs``).
Cross-replica pairs at ~0 cosine are absent by construction; any the LSH
finds above threshold are counted separately (``extra``) and never
against recall.

Usage: python tools/lsh_recall_sweep.py [--k=16]
Writes one result line per geometry; paste the table into SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD = 0.35  # the fixture's hard regime (p = 0.614 per hyperplane)


def main() -> None:
    k = 16
    for a in sys.argv[1:]:
        if a.startswith("--k="):
            k = int(a.split("=", 1)[1])

    from pyspark.sql import functions as F

    from signal_messenger_vector_database_spark.operators.ann import (
        exact_cosine_pairs,
        lsh_cosine_pairs,
        lsh_geometry,
    )
    from signal_messenger_vector_database_spark.schemas import FIXTURE_EMBEDDING_DIM
    from signal_messenger_vector_database_spark.session import get_spark
    from tools.scaling_probe import BASE, build_scaled

    spark = get_spark("lsh-recall-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    base_emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    n1 = base_emb.count()

    print(f"# ground truth: exact pairs at 1x (n={n1}) ...", flush=True)
    t0 = time.time()
    exact = set(
        (r.id_a, r.id_b)
        for r in exact_cosine_pairs(base_emb, THRESHOLD).collect()
    )
    print(f"#   {len(exact)} true pairs/replica in {time.time()-t0:.1f}s", flush=True)
    truth = set()
    for rep in range(k):
        off = rep * n1
        truth.update((a + off, b + off) for a, b in exact)

    scaled_dir = build_scaled(spark, k)
    emb = spark.read.parquet(os.path.join(scaled_dir, "embeddings.parquet"))
    n = emb.count()

    # The grid: the r7 operating point, the new 0.8 default, a mid
    # point, and a bigger-bucket alternative (fewer tables, fatter
    # verify) — same analytic family, different cost split.
    grid = [
        ("r7 default (target 0.45)", lsh_geometry(n, THRESHOLD, 128, 0.45)),
        ("mid (target 0.65)", lsh_geometry(n, THRESHOLD, 128, 0.65)),
        ("r8 default (target 0.8)", lsh_geometry(n, THRESHOLD, 128, 0.8)),
        ("fat buckets (target 0.8, B=512)", lsh_geometry(n, THRESHOLD, 512, 0.8)),
    ]

    print(f"# sweep at {k}x: n={n}, threshold={THRESHOLD}")
    print("| geometry | planes | tables | predicted | time_s | found | recall | extra |")
    print("|---|---|---|---|---|---|---|---|")
    for label, g in grid:
        planes, tables = g
        t0 = time.time()
        found = set(
            (r.id_a, r.id_b)
            for r in lsh_cosine_pairs(
                emb,
                THRESHOLD,
                dim=FIXTURE_EMBEDDING_DIM,
                n_planes=planes,
                n_tables=tables,
            ).collect()
        )
        dt = time.time() - t0
        hit = len(found & truth)
        extra = len(found - truth)
        recall = hit / len(truth) if truth else float("nan")
        print(
            f"| {label} | {planes} | {tables} | {g.predicted_recall:.3f} "
            f"| {dt:.1f} | {len(found)} | **{recall:.3f}** | {extra} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
