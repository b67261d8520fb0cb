"""Spark Connect end-to-end smoke (VERDICT r13 #7).

r12/r13 added Connect-safe fallbacks at three seams —
``io.sources.ensure_parallelism`` (no ``_jdf``/RDD access path),
the ivf_index session memo (health/unpersist probes degrade to
"assume healthy" when ``_jdf`` is unreachable), and
``exact_cosine_pairs`` — but no Spark Connect session had ever
actually exercised them.  This tool runs a representative catalog
slice through a REAL Connect session: ``SparkSession.builder
.remote("local[...]")`` auto-starts a local Spark Connect server
(Spark 4.x) and every DataFrame operation then crosses the gRPC
boundary, so any `_jdf` / `_jsc` / RDD touch in a query's plan path
raises instead of silently running classic-mode.

Environment gate: Connect needs ``grpcio`` + ``protobuf`` (the
``pyspark[connect]`` extras).  This sandbox ships neither (the same
gate that skips the transformWithStateInPandas arm), so here the tool
reports SKIP and exits 0 — run it on any box with the extras to get
the green run ROUND14.md describes.  tests/test_tools.py pins the
gate logic so a dep-present box cannot silently skip.

Usage:
    python tools/connect_smoke.py [sf_dir]

Exit codes: 0 = all green (or clean SKIP: missing deps), 1 = a query
failed under Connect.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# One query per family, biased toward the Connect-fallback seams:
# ensure_parallelism consumers (decontaminate, minhash_lsh_pairs,
# curation_pipeline), session-memo seam consumers (semdedup,
# ivf_maintenance, topk_ivf_filtered, topk_ivf_sq8, maxsim_retrieve,
# topk_ivf_lifecycle), exact_cosine_pairs (embedding_neardup_exact_
# baseline), plus relational / OLAP / text / TPC-H / window / sketch /
# multimodal coverage.
SLICE = [
    "rag_retrieve",
    "topk_cosine",
    "contact_enrich",
    "range_scan",
    "pricing_summary",
    "q3_shipping_priority",
    "window_range_frame",
    "sketch_quantiles",
    "tokenize",
    "chunk_explode",
    "gopher_quality_filter",
    "exact_dedup",
    "minhash_lsh_pairs",
    "decontaminate",
    "curation_pipeline",
    "semdedup",
    "ivf_maintenance",
    "topk_ivf_filtered",
    "topk_ivf_sq8",
    "maxsim_retrieve",
    "topk_ivf_lifecycle",
    "embedding_neardup_exact_baseline",
    "multimodal_metadata",
]


def connect_available() -> tuple[bool, str]:
    """(available, reason).  The gate tests/test_tools.py pins: Connect
    is available exactly when grpcio AND protobuf import."""
    for mod in ("grpc", "google.protobuf"):
        if importlib.util.find_spec(mod) is None:
            return False, f"missing dependency: {mod} (pyspark[connect] extras)"
    return True, "grpcio + protobuf present"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    ok, reason = connect_available()
    if not ok:
        print(f"SKIP: Spark Connect deps unavailable — {reason}")
        return

    from pyspark.sql import SparkSession

    # remote("local[...]") auto-starts a local Spark Connect server;
    # every subsequent DataFrame call crosses gRPC — the point.
    spark = (
        SparkSession.builder.remote("local[4]")
        .appName("smvd-connect-smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    # hard proof this is a Connect session, not a classic fallback
    assert type(spark).__module__.startswith("pyspark.sql.connect"), type(spark)

    from signal_messenger_vector_database_spark.plans.catalog import all_specs

    specs = all_specs()
    failures = []
    for name in SLICE:
        t0 = time.time()
        try:
            n = len(specs[name].fn(spark, sf_dir).collect())
            # zero rows is a failure — the per-query line must say so,
            # not print OK and then contradict the exit summary (ADVICE r14)
            if n == 0:
                print(f"  {name:36s} rows={n:6d}  FAIL (zero rows)")
                failures.append((name, "zero rows"))
            else:
                print(f"  {name:36s} rows={n:6d}  OK {time.time() - t0:5.1f}s")
        except Exception as ex:  # noqa: BLE001 — a smoke reports, not raises
            print(f"  {name:36s} FAIL {type(ex).__name__}: {str(ex)[:160]}")
            failures.append((name, str(ex)[:200]))
    spark.stop()
    if failures:
        print(f"{len(failures)} FAILURES under Connect: {[f[0] for f in failures]}")
        sys.exit(1)
    print(f"all {len(SLICE)} queries green under Spark Connect")


if __name__ == "__main__":
    main()
