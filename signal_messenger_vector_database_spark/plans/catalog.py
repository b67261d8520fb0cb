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

# Round-2 verification window: previously-unverified oracle-paired queries
# (TPC-H shapes first — they anchor the OLAP claim), the two entries whose
# oracles are new this round (binaryfile_scan, multimodal_features), and
# the MLlib LSH/ANN trio VERDICT task 6 asked to move in-window.
_WINDOW = [
    # TPC-H shapes (plans/tpch.py) — all unchecked in round 1
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
    # OLAP / window family (plans/olap.py)
    "rollup_agg",
    "cube_agg",
    "grouping_sets_agg",
    "pivot_counts",
    "unpivot_metrics",
    "running_window",
    "rank_family",
    "window_range_frame",
    "percentile_summary",
    "sessionize",
    "event_funnel",
    "retention_cohorts",
    "user_trend",
    "date_spine_fill",
    "locf_fill",
    "semi_anti_join",
    "correlated_subquery",
    "nullsafe_join",
    # training-data prep (plans/traindata.py)
    "stratified_sample",
    "pii_redact",
    "dedup_keep_first",
    "train_test_split",
    "token_packing",
    "repetition_score",
    "tfidf_top_terms",
    # vector ops (plans/vectorops.py)
    "embedding_centroids",
    "kmeans_assign",
    # newly oracle-paired this round
    "binaryfile_scan",
    "multimodal_features",
    # MLlib LSH / ANN (plans/mllib_lsh.py) — VERDICT task 6
    "ann_point_query",
    "brp_lsh_neighbors",
    "minhash_lsh_mllib",
]


# Round-3 rotation queue (locally verified, not yet driver-checked —
# see COVERAGE.md "Verification ledger"): tokenize_cl100k, asof_join,
# interval_join, json_props, variant_props, hex_project, dense_ids,
# array_set_ops, explode_outer_words, chunk_udtf, chunk_strict_reference,
# skew_salted_join, upsert_latest, price_histogram, csv_roundtrip,
# jsonl_roundtrip, orc_roundtrip, bm25_topk, hybrid_rrf, decontaminate,
# embedding_quantize_int8, topk_cosine_int8, scd2_intervals,
# domain_mixture, hll_distinct, bloom_membership, cms_heavy_hitters,
# stream_sessionize, multimodal_frames, sql_interface, per_group_sample,
# length_buckets, schema_evolution, minhash_jaccard_estimate,
# feature_hashing, mime_sniff, bigram_logprob, ewma_per_user,
# and the late-round-2 batch: ols_regression, zscore_outliers,
# cumulative_distinct, dq_audit, collocations_pmi, fuzzy_dedup_edit,
# interval_join_binned, embedding_covariance, random_projection,
# embedding_neardup_lsh, kmeans_lloyd3, weighted_sample, mad_outliers,
# zipf_fit, pagerank3, first_touch_attribution, range_partition_bounds,
# incremental_new_docs, inverted_index, assoc_rules, deletion_audit,
# table_stats, pq_encode, topk_pq_adc, zorder_key, markov_transitions.
# Next round: rotate ~50 of these into _WINDOW
# (oldest-unchecked first), keeping no-oracle entries at the tail.


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
