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

# Round-5 verification window (VERDICT r4 task 1): the COMPLETE 27-entry
# tail of oracle-paired queries that have never had a green driver
# CORRECTNESS row (all judge-verified locally green at sf0.01 in r4),
# including embedding_neardup_lsh whose only driver row is an r1
# ``no_oracle`` err from before its oracle existed.  Appended after the
# tail: the queries whose plans CHANGE this round (token_packing,
# rank_family — scale-shape rewrites per VERDICT r4 tasks 2 and 6;
# zipf_fit / line_dedup / pq_encode / topk_pq_adc are already in the
# tail) so the driver re-proves them on the new plans.  This closes
# driver-verified coverage to 169/169 oracle-paired queries.
_WINDOW = [
    # -- never-driver-verified tail (27) --
    "assoc_rules",
    "bfs_khops",
    "chunk_overlap",
    "cusum_drift",
    "deletion_audit",
    "embedding_covariance",
    "embedding_neardup_exact_baseline",
    "embedding_neardup_lsh",
    "first_touch_attribution",
    "incremental_new_docs",
    "kmeans_lloyd3",
    "lateral_topk",
    "line_dedup",
    "mad_outliers",
    "pq_encode",
    "pyds_scan",
    "random_projection",
    "range_partition_bounds",
    "shingle_containment",
    "sorted_neighborhood",
    "table_stats",
    "topk_pq_adc",
    "triangle_count",
    "weighted_sample",
    "winsorized_stats",
    "zipf_fit",
    "zorder_key",
    # -- plans rewritten this round, re-proved on the new shape --
    "token_packing",
    "rank_family",
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
