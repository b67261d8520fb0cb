"""Aggregated query catalog: every implemented operator from SURVEY §2.

``__spark_entry__.py`` (the driver contract) is a thin adapter over this.

Ordering contract: the driver verifies only the FIRST 50 entries of
``queries()`` against their DuckDB oracles each round, so insertion order
is a verification budget.  ``_WINDOW`` below pins the 50 queries to check
this round (round 2: the TPC-H / OLAP / training-data / vector-ops
families that had no CORRECTNESS row in round 1, per VERDICT.md task 1);
everything else follows in catalog order, with oracle-less entries
(which can never turn green) sorted to the tail.
"""

from __future__ import annotations

import importlib

from .registry import QuerySpec

# Every plan module contributes SPECS.  A missing module or a duplicate
# query name is a hard error: silently skipping one would silently shrink
# the catalog and its oracles (ADVICE r1).
_MODULES = (
    "pipeline",
    "relational",
    "similarity",
    "textanalysis",
    "streaming_queries",
    "multimodal",
    "advanced",
    "analytics",
    "mllib_lsh",
    "tpch",
    "traindata",
    "olap",
    "vectorops",
    "scale_queries",
    "formats",
    "retrieval",
    "stats",
    "graph",
)

# Round-6 verification window (VERDICT r5 task 2): every ts-sensitive
# streaming query — their green driver rows are STALE r1 results from the
# old INT64-nanos fixtures, and the round-5 judge reproduced wrong answers
# on three of them before this round's ts-unit fix (streaming/ingest.py).
# The driver must re-prove them on the current timestamp[us] fixtures.
# Then: topk_pq_adc (the only oracle-paired query still without a green
# driver row — its r5 row was a hash FAIL, fixed this round: codegen
# restructure + 1e-4 ADC grain) and the queries whose plans CHANGE this
# round so the driver re-proves the new shapes (pq_encode: transform-based
# distances; rank_family: the r4-task-6 two-pass range-partition+offset
# rewrite, actually performed this round; line_dedup: forced broadcast
# dropped; token_packing: corpus-scaled bucket width).
_WINDOW = [
    # -- ts-sensitive streaming: stale r1 greens, re-prove on new fixtures --
    "stream_windowed_counts",
    "stream_sessionize",
    "stream_stream_join",
    "stream_dedup_watermark",
    "stream_dedup_counts",
    "stream_static_join",
    "stream_stateful_totals",
    "asof_join",
    "sessionize",
    # -- first-ever green row wanted: r5 hash-FAIL fixed this round --
    "topk_pq_adc",
    # -- plans changed this round, re-prove on the new shapes --
    "pq_encode",
    "rank_family",
    "line_dedup",
    "token_packing",
    # -- minhash family: 4-slices-per-md5 signature scheme (values change) --
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_jaccard_estimate",
    "neardup_clusters",
]


def all_specs() -> dict[str, QuerySpec]:
    merged: dict[str, QuerySpec] = {}
    for module_name in _MODULES:
        m = importlib.import_module(f".{module_name}", __package__)
        overlap = merged.keys() & m.SPECS.keys()
        if overlap:
            raise ValueError(
                f"duplicate query names in {module_name}: {sorted(overlap)}"
            )
        merged.update(m.SPECS)

    missing = [n for n in _WINDOW if n not in merged]
    if missing:
        raise ValueError(f"_WINDOW names not in catalog: {missing}")
    if len(_WINDOW) != len(set(_WINDOW)):
        raise ValueError("_WINDOW contains duplicates")

    window = {n: merged[n] for n in _WINDOW}
    rest_oracle = {
        n: s for n, s in merged.items() if n not in window and s.oracle is not None
    }
    rest_bare = {
        n: s for n, s in merged.items() if n not in window and s.oracle is None
    }
    return {**window, **rest_oracle, **rest_bare}
