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

# Round-3 verification window: the rotation queue pinned at the end of
# round 2, oldest-unchecked first, plus (a) multimodal_features — its r2
# row failed on OUTPUT SHAPE (array column vs the harness canonicalizer),
# re-checked here after flattening, (b) the r2-VERDICT must-haves pulled
# forward from deeper in the queue: inverted_index (task 1 reshape),
# pagerank3 + the new pagerank3_shuffle (task 3), markov_transitions
# (task 4 streaming family), and (c) the four other reshaped-output
# queries (array_set_ops, feature_hashing, embedding_quantize_int8 are
# already in queue order; multimodal_frames is task 7).
_WINDOW = [
    "tokenize_cl100k",
    "asof_join",
    "interval_join",
    "json_props",
    "variant_props",
    "hex_project",
    "dense_ids",
    "array_set_ops",
    "explode_outer_words",
    "chunk_udtf",
    "chunk_strict_reference",
    "skew_salted_join",
    "upsert_latest",
    "price_histogram",
    "csv_roundtrip",
    "jsonl_roundtrip",
    "orc_roundtrip",
    "bm25_topk",
    "hybrid_rrf",
    "decontaminate",
    "embedding_quantize_int8",
    "topk_cosine_int8",
    "scd2_intervals",
    "domain_mixture",
    "hll_distinct",
    "bloom_membership",
    "cms_heavy_hitters",
    "stream_sessionize",
    "multimodal_frames",
    "sql_interface",
    "per_group_sample",
    "length_buckets",
    "schema_evolution",
    "minhash_jaccard_estimate",
    "feature_hashing",
    "mime_sniff",
    "bigram_logprob",
    "ewma_per_user",
    "ols_regression",
    "zscore_outliers",
    "cumulative_distinct",
    "dq_audit",
    "collocations_pmi",
    "fuzzy_dedup_edit",
    "interval_join_binned",
    # pulled forward (see header note)
    "multimodal_features",
    "inverted_index",
    "pagerank3",
    "pagerank3_shuffle",
    "markov_transitions",
]


# Round-4 rotation queue — the COMPLETE remaining tail of oracle-paired
# queries without a driver CORRECTNESS row after round 3 (16 entries,
# fits in one window; pre-committed per r2 VERDICT task 6 so no query
# ships driver-unverified by round 4):
#   embedding_covariance, random_projection, embedding_neardup_lsh,
#   kmeans_lloyd3, weighted_sample, mad_outliers, zipf_fit,
#   first_touch_attribution, range_partition_bounds, incremental_new_docs,
#   assoc_rules, deletion_audit, table_stats, pq_encode, topk_pq_adc,
#   zorder_key,
# plus the queries newly added during round 3 (locally green, appended
# newest last):
#   triangle_count, bfs_khops, chunk_overlap, cusum_drift,
#   sorted_neighborhood, shingle_containment, lateral_topk, line_dedup,
#   pyds_scan, winsorized_stats,
# with no-oracle entries at the tail.  26 entries total — one window.


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
