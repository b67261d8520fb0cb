"""Aggregated query catalog: every implemented operator from SURVEY §2.

``__spark_entry__.py`` (the driver contract) is a thin adapter over this.

Ordering contract: the driver verifies only the FIRST 50 entries of
``queries()`` against their DuckDB oracles each round, so insertion order
is a verification budget.  ``_WINDOW`` below pins this round's priority
list (see its comment block); everything else follows in catalog order,
with oracle-less entries (which can never turn green) sorted to the tail.
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
    "retrieval_eval",
    "pq_trained",
    "stats",
    "graph",
)

# Round-9 verification window (VERDICT r8 tasks 1-5), sized to the
# driver's exact 50-query budget:
#   1. NEW queries, never driver-checked: the trained-PQ operating
#      point pair, the 64-bit SimHash rung, the streaming ingest->index
#      composition, and the retained kmeans SemDeDup arm;
#   2. CHANGED plans/oracles: every scaled-k consumer rewired onto the
#      shared two-level-assignment CTE chain this round (semdedup,
#      knn_graph_ivf, ivf_maintenance, ann_recall_at_k,
#      hard_negative_mining) plus the two hier queries whose oracle
#      moved into plans/ivf_sql.py (ivf_hier_quality, ann_ivf_hier);
#   3. staleness rotation, oldest-first: the r2-era block (TPC-H
#      q-series, OLAP shapes, window/fill ops, sampling) — 88 entries'
#      latest driver row predates r5; the 33 slots left (50 - 8 new -
#      9 changed) take the oldest 33, and the 9 r2 leftovers
#      (tfidf_top_terms, embedding_centroids, kmeans_assign,
#      minhash_lsh_mllib, repetition_score, train_test_split,
#      stratified_sample, pii_redact, dedup_keep_first) plus the r4
#      block (46 entries) queue for r10.  All stay green in the local
#      three-scale sweeps meanwhile.
_WINDOW = [
    # -- never driver-checked (new this round) --
    "pq_operating_point",
    "topk_ivf_pq_trained",
    "simhash_hamming_pairs_w64",
    "stream_ingest_index",
    "semdedup_trained",
    "dim_ablation_recall",
    "simhash_hamming_pairs_auto",
    "stream_lsh_dedup",
    # -- changed plans/oracles (two-level assignment rewiring) --
    "semdedup",
    "semdedup_capped",
    "knn_graph_uncapped",
    "knn_graph_ivf",
    "ivf_maintenance",
    "ann_recall_at_k",
    "hard_negative_mining",
    "ivf_hier_quality",
    "ann_ivf_hier",
    # -- staleness rotation: r2-era, oldest driver rows in the catalog --
    "q2_min_price",
    "q3_shipping_priority",
    "q4_priority_exists",
    "q5_local_supplier",
    "q6_revenue_delta",
    "q7_nation_volume",
    "q8_market_share",
    "q9_nation_profit",
    "q10_returned_items",
    "q11_value_share",
    "q13_order_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q22_dormant_customers",
    "rollup_agg",
    "cube_agg",
    "grouping_sets_agg",
    "pivot_counts",
    "unpivot_metrics",
    "running_window",
    "window_range_frame",
    "percentile_summary",
    "event_funnel",
    "retention_cohorts",
    "date_spine_fill",
    "locf_fill",
    "semi_anti_join",
    "correlated_subquery",
    "nullsafe_join",
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
