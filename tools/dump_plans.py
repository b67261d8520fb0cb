"""Regenerate EXPLAIN.md: formatted physical plans of the flagship queries
with the scale-relevant properties called out.  Run from the repo root:

    python tools/dump_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMMENTARY = {
    "rag_retrieve": "The flagship: question-vector inlined as a literal, cosine scored in codegen, TakeOrderedAndProject keeps k rows, the k-row context side collapses to a single-partition agg — the entire RAG retrieval is one scan plus k rows of movement.",
    "topk_cosine": "Exact cosine top-k: query-vector point filter is PUSHED to the scan; the single-row side rides a BroadcastNestedLoopJoin; TakeOrderedAndProject keeps k rows per partition — no global sort, near-zero shuffle.",
    "pricing_summary": "TPC-H Q1 shape: shipdate predicate pushed to parquet; ReadSchema pruned to the 7 referenced columns; two-phase (partial/final) hash aggregation.",
    "region_rollup": "Fact -> dim chain: every dimension join is a BroadcastHashJoin; the orders fact table is scanned once and never shuffled for the joins.",
    "minhash_lsh_pairs": "Relational MinHash: shingles exploded to rows, signatures as min() aggregates, LSH candidates via equi-join on band keys — no cross join anywhere.  Round-2 revision: shingle sets AND signatures come from ONE explode/shuffle (minhash_with_shingles: collect_set + 16 min() in the same groupBy, persisted once; banding and Jaccard verify are projections), where round 1 ran the explode twice — sf0.1 timed run 2.9 s -> 2.2 s, one fewer full corpus pass at 100 TB.  Stage times at sf0.1 (noop sink, warm): shingles+signatures ~1.3 s, band join ~0.9 s, Jaccard verify ~1.1 s.",
    "asof_join": "As-of join via union+window: both sides union, ONE shuffle on the key, last_value(ignorenulls) carries the prior right row; contrast a per-key theta join.",
    "q5_local_supplier": "6-way join: date filter pushed to the orders scan, supplier/nation/region broadcast, residual c_nationkey = s_nationkey evaluated inside the broadcast join.",
    "q19_bracket_revenue": "Disjunctive bracket predicates: the partkey equi-join stays a BroadcastHashJoin with the OR-bracket as a residual condition; the common l_quantity/p_size bounds are NOT lost — Catalyst keeps the scan selective.",
    "window_range_frame": "Time-RANGE running sum: single shuffle on user_id, one sort per partition, RangeFrame evaluated streamingly — the naive self-join formulation would be O(n^2) per user.",
    "kmeans_assign": "Iterative-ML building block: tiny centroid side broadcast (BroadcastNestedLoopJoin over k rows), the 500k-vector side never shuffles for the join; argmin via min_by partial aggregation.",
    "embedding_centroids": "posexplode multiplies rows 64x but partial aggregation collapses them map-side before the single (label,pos) exchange.",
    "retention_cohorts": "Cohort matrix: the per-user MIN(day) aggregate and the subsequent join + countDistinct all hash on user_id — AQE reuses the exchange instead of re-shuffling.",
    "q4_priority_exists": "EXISTS subquery decorrelated: the physical plan is a plain left-semi hash join on o_orderkey — no per-row subquery execution survives.",
    "variant_props": "VariantType extraction: parse_json + variant_get evaluate inside WholeStageCodegen; the filter on the extracted path is applied before any wide projection.",
    "ann_ivf": "IVF build + search. Round-2 fix: the nearest-centroid argmax is groupBy(vec_id).min_by over the broadcast centroid cross — partial aggregation collapses n*k scored rows to n map-side, where round 1's Window.partitionBy+row_number shuffled all n*k (no partial agg in windows). No Window node in this plan (asserted by test_scale).",
    "ingest_pipeline": "suppress -> chunk -> tokenize -> embed. Stage times at sf0.1: suppress 0.3 s; +chunk/tokenize 1.2 s; full with the Arrow-batched embed stage (repartition 8) 2.6 s — the Python crossing is ~55% of wall clock and is what the embed_partitions knob spreads across executors. The suppression filter sits ahead of the chunk explode (asserted by test_scale).",
    "bm25_topk": "Lexical BM25: the query-term filter sits DIRECTLY on the shingle explode, map-side below every Exchange (asserted by test_scale), so the tf/df shuffle carries |query|-term postings, not the corpus index. Corpus stats and per-term df are 1-row/|q|-row broadcasts; top-k is TakeOrderedAndProject; no Window.",
    "hll_distinct": "From-scratch md5-portable HyperLogLog (p=8): rank rows partial-aggregate map-side into 256 registers (HashAggregate both sides of a 256-row exchange), one scalar agg folds registers into the estimate — the mergeable-sketch shape; combine traffic is 256 rows per map task at any cluster size. Oracle-paired EXACTLY (both engines replay identical registers); Bloom (bloom_membership) and Count-Min (cms_heavy_hitters) follow the same pattern.",
    "embedding_quantize_int8": "Per-vector symmetric int8 quantization: pure expression pipeline (array_max / transform / zip_with fold) inside WholeStageCodegen, zero shuffles beyond the scan. 4x memory cut for the ANN working set; cosine over quantized arrays reuses the same expression because per-vector scales cancel.",
    "decontaminate": "Train-vs-test 5-gram contamination: ONE explode pass tagged with the md5 split, two DISTINCT projections, gram equi-join + count_distinct — never a text-to-text comparison. Hot-gram skew inherits the ngram stop-shingle story (long grams make it rare).",
    "scd2_intervals": "CDC compaction -> SCD2: lag-filter drops same-state runs, lead derives [valid_from, valid_to); both windows share the (user_id, ts) sort so ONE shuffle serves the whole build.",
    "ewma_per_user": "Sequential-fold shape for recursive accumulators: one shuffle gathers each user's ordered series as an array, the EWMA folds per row in the JVM; state is bounded per key. DuckDB list_reduce seeds acc with the first element — the Spark fold replicates that seeding so both engines run the identical float sequence.",
    "interval_join_binned": "Keyless time-range join as a bucket equi-join: clicks carry their 15-min epoch bucket, signups explode to (own, next) bucket, the range predicate filters in-bucket candidates. Shuffle volume is O(rows); the naive formulation is a BroadcastNestedLoopJoin that goes quadratic at scale (absence asserted by test_scale).",
    "fuzzy_dedup_edit": "Record-linkage block+verify: candidates meet on a (token, length-band) equi-key with the left side exploded to adjacent bands (lossless for edit distance <= 3 — proved against brute force in tests); exact levenshtein runs only on candidates. No cross join; block-key frequency is vocabulary-bounded.",
    "weighted_sample": "Efraimidis-Spirakis A-Res in one pass: the md5-derived draw and -ln(u)/w key are pure codegen expressions over the scan; TakeOrderedAndProject keeps the n smallest keys with per-partition heaps — no global sort, reproducible on any cluster size.",
    "cumulative_distinct": "Distinct-to-date without unbounded window state: first-touch MIN(hour) per user (one shuffle, partial-agg), then the running sum over the per-hour series — the single-partition window touches only driver-scale cardinality.",
    "dq_audit": "Declarative constraint report: each table's domain checks share one conditional-aggregate scan (3 checks, 1 lineitem pass); referential orphans are a broadcast anti-join; the union of 1-row results is free.",
    "kmeans_lloyd3": "Three full Lloyd rounds: per round the whole codebook collapses to ONE broadcast array-of-structs row and every vector computes its argmin in place with nested higher-order functions — no (vector, centroid) pair rows, no assignment shuffle (r7; the old explode+min_by shape was n*k rows per round, n^2/125 under SemDeDup's corpus-scaled k). posexplode+two-key agg rebuilds centroids; the input stays cached. The DuckDB oracle unrolls the identical 3 rounds as chained CTEs.",
    "pagerank3": "Pregel-lite PageRank: each round is edges JOIN ranks (shuffle on the edge key) + partial-aggregated SUM per destination; rank state stays fully distributed (zero driver state). At scale, bucketing edges by dst makes the per-round shuffle a one-time cost.",
    "random_projection": "Seeded Rademacher 64->8 projection: literal +/- chains evaluate entirely inside WholeStageCodegen over the scan — zero shuffles, zero Python; the same literals are baked into the oracle SQL.",
    "assoc_rules": "Association rules: distinct (user, type) then a self-equi-join on user_id whose fan-out is capped by the type vocabulary (k(k-1)/2 pairs per user), margins broadcast back — the Apriori first level with a designed-in blow-up bound.",
    "deletion_audit": "GDPR cascade audit: each referential level is a broadcast semi-join against the (small) deletion frontier; facts are scanned once, never shuffled. The actual delete is the anti-join complement written back.",
    "first_touch_attribution": "As-of attribution: clicks and purchases share ONE shuffle+sort on (user_id, ts); last(click, ignorenulls) carries state forward — no per-pair theta join at any scale.",
    "incremental_new_docs": "Per-delivery ingest dedup: the new batch left-joins compact fingerprint history (equi-join on md5, Bloom-prefilterable) — novelty detection without re-scanning the lake.",
    "pq_encode": "Product quantization encode: 128 literal-codeword distances evaluate as flat codegen arithmetic over the scan; argmin per subspace off a materialized array column (inlining it twice doubles the tree). 8x 4-bit codes = 64x compression for the ANN working set.",
    "topk_pq_adc": "Asymmetric-distance top-k: per-subspace lookup tables are literal arrays subscripted by the 8 stored codes — the hot loop reads 8 bytes/vector; TakeOrderedAndProject keeps k rows.",
    "zorder_key": "Morton clustering key: bit interleaving as pure integer expressions inside codegen; sort by zkey before writing and parquet min/max row-group stats become selective for BOTH dimensions.",
    "pagerank3_shuffle": "The billions-of-nodes PageRank strategy (size-gated via pagerank_rounds(mode='auto')): edges hash-partition ONCE on the src key (REPARTITION_BY_COL) and are persisted; every round's rank join reuses that partitioning — no planner-inserted exchange ever touches the edge fact again (asserted by test_scale), and the only per-round shuffle is the partial-aggregated per-destination contribution on the dst key.",
    "triangle_count": "Degree-oriented triangle counting: every edge directed from its (degree,id)-smaller endpoint, wedges enumerated only over out-edges, closed by a (src,dst) equi-join. Out-degree under orientation is O(sqrt(m)) even at a hub, so wedge volume is bounded where the naive triple join goes quadratic on hot nodes; no theta join in the plan (asserted by tests).",
    "cusum_drift": "Recursive CUSUM fold rewritten via the prefix-sum identity S_i = P_i - min(0, running-min P): two running windows per user replace the unexpressible recursion — no per-user array gather, state is the window frame, partitions parallelize across users. Centering mean is a DECIMAL-exact sum so both engines subtract the identical constant.",
    "shingle_containment": "Asymmetric containment dedup: candidates from the shingle equi-join with the max_df stop-shingle projection (join cost is sum(df^2) — hot shingles dominate quadratically with no signal; 26 s -> 1.6 s at sf0.1). Sizes computed in the same projected space keep C(A->B)=1.0 for true subsets.",
    "sorted_neighborhood": "Sorted-neighborhood blocking: rank windows run PER PREFIX BLOCK (parallel, never one global-ordered task); the candidate join carries (block, rank-bin) in the EQUI key — r7, after the scaling probe measured the block-only join quadratic (319 s at 16x; the rank-delta residual filtered block_size^2 physical comparisons) — so per-block work is O(block_size * w) and levenshtein runs on w*n candidates.",
    "rank_family": "Global ranking without the single-task global window: the bucket id is a pure function of the key VALUE (sampled quantile boundaries as literals — r7, replacing spark_partition_id() whose branch-stability depended on exchange reuse), local row_number per bucket runs in parallel, and the only single-partition stage is the ~32-row offset prefix sum.",
    "rank_family_ties": "The tie-aware variant over the non-unique o_orderdate key: value bucketing guarantees a tie group never spans buckets, so per-bucket rank/dense_rank are exact and global ranks are local + prefix-summed (row, distinct-key) offsets. rank != dense_rank != row_number is actually exercised here.",
    "semdedup": "SemDeDup, default path (r10): coarse assignment is the shared TWO-LEVEL quantizer (ivf_assign_hier — n*(1+nprobe)*sqrt(k) cosines), then capped_cell_split — an md5-derived sub id (pure codegen arithmetic, zero cosines) for any cell over the cap — and the cosine pair join fenced on (cluster, sub) with per-vector norms hoisted; keep rule is a left-anti against the dropped-id set. Candidate volume bounded by construction on ANY distribution (wave 14/16: skewed x16 went 115.4M fenced pairs / >50 min uncapped to ~592k pairs / seconds; parity on i.i.d. replicas). semdedup_uncapped keeps the r9 fence as the baseline.",
    "semdedup_trained": "The kmeans-trained-centroid arm of SemDeDup (r9): 3 relational Lloyd rounds (broadcast codebook row, in-place argmin) buy balanced cells at 3*n*k assignment cost — the quality option when seeded Voronoi cell-size variance matters (skew probe, SCALING.md wave 14); the pair join and keep rule are identical to the default.",
    "gopher_quality_filter": "Gopher keep/drop composite, single-pass (r7): all four rule features are moments of the per-doc (word, count) table — total words, character mass, stopword hits, top-word count — one explode + two doc-keyed partial-aggregated groupBys, no array folds, no re-join (3.2 s -> 0.8 s at sf0.1).",
    "q21_waiting_supplier": "TPC-H Q21 shape: the EXISTS and NOT EXISTS lineitem self-correlations decorrelate into one left-semi and one left-anti hash join on l_orderkey (asserted by test_scale) — no per-row subquery execution; nation/supplier broadcast.",
    "dsir_weights": "DSIR importance weights: hashed uni+bigram features (md5 mod 128, no vocabulary); the (doc, lang, bucket) aggregate is PERSISTED because Catalyst cannot reuse the exchange across its three consumers (the target branch's lang filter pushes below the aggregation, making the subtrees physically distinct — measured 5 parquet scans without the pin); the 128-row log-ratio table broadcasts into the per-doc scoring join.",
    "ccnet_buckets": "CCNet head/middle/tail perplexity tertiles: unigram-LM cross-entropy per doc (tiny word-count table broadcast, result persisted — the ranking subtree and the final join both consume it and a re-computed float log-sum could round differently on a 1e-4 boundary), then NTILE(3) via the tie-aware two-pass global ranking operator — no single-task global window.",
    "topk_ivf_pq": "IVF-PQ capstone: the coarse assignment prunes candidates to the probed cluster (broadcast centroid table, min_by partial-agg), then ADC scores 8-byte codes against a broadcast literal LUT — the hot loop reads 8 bytes/candidate; TakeOrderedAndProject keeps k.",
    "percentile_summary": "Exact percentiles WITHOUT per-group value buffering (r7): the per-(group, value) histogram is bounded by the value domain, not the corpus; a running-count window over histogram rows locates the order statistics and conditional aggregates pick lo/hi — Spark's percentile() aggregate would hold every group value in one buffer (~n/3 doubles on one executor), the quiet OOM at scale.",
    "attachment_spec": "K5 AttachmentSpec build: binaryFile scan with the content column pruned (only path/length are read), extension->mime as a literal CASE cascade — the upload side-effect is the K4 dispatch seam, outside the analytic plan.",
    "dup_substring_spans": "Cross-document exact-substring spans (r8): content-defined anchors (md5 head of each position's 8-gram) pick the window set, so shared blocks hash identically at ANY alignment; the window table carries (doc_id, md5) only — the substring never crosses the wire — and is PERSISTED because the dup-set groupBy and the flag join both consume it (unpinned, the per-position md5 Generate ran twice — 3.91 s -> 2.91 s at 16x). Both downstream ops key on the window hash, whose cardinality grows with the corpus; NO pair join exists in this plan: span dedup is linear where document near-dup needs candidates (probe: 2.0x at 16x).",
    "topk_pq_rerank": "Two-stage retrieval (r8): the ADC shortlist is a TakeOrderedAndProject over the 8-byte codes (literal LUT, no per-query join), then ONLY the 100 shortlist vectors re-join the full-precision table (broadcast) for exact cosine re-rank — corpus-size-independent second stage (probe: 1.4x at 16x).",
    "dedup_quality_keep": "Quality-aware dedup completion (r8): minhash-LSH pairs -> iterative connected components -> per-cluster argmax via min_by over the (-quality, doc_id) struct — a partial-aggregated groupBy on cluster, never a corpus window; singletons coalesce to their own cluster through the left join. Probe: 3.9x at 16x, inherited from the probed pair/component stages.",
    "token_budget_waterfill": "UniMax water-filling in closed form (r8): the corpus collapses to D domain rows FIRST (partial-aggregated token sum), then saturation is an exact-integer inequality over a running window and the water level one expression over two D-row windows — single-partition window state is the domain vocabulary, the kmeans-codebook scale pattern. Probe: 2.6x at 16x.",
    "simhash_hamming_pairs": "Hamming-ball dedup completion (r8 second batch): candidates from the (band, band_value) equi-join — pigeonhole-complete for d<=ham_max when bands > ham_max — then an integer-only bit_count(XOR) verify; no floating point exists in this plan at all. The scan->explode->join chain shuffles on the band key; bucket population is n/2^band_width, so the production geometry widens the fingerprint with the corpus (4x16 bands at 64-bit = 65k buckets/band) — geometry is a caller knob, exactly like lsh_geometry.",
    "knn_graph_ivf": "k-NN GRAPH (r10: fenced on the capped (cluster, sub) key — the same hash-balanced split as the semdedup default, bounded candidates on any distribution; skewed x16 in ~15 s where the uncapped fence shares the mega-cell straggler), top-3 per source is a bounded window over ~sub-cell-sized groups. Candidate volume is sum(|c|^2) over sub-cells — bounded at scale by k ~ n/target plus the cap; within the fence the graph is EXACT (tested against brute force). Per-vector L2 norms hoisted out of the pair loop (bit-identical, a third of the flops). knn_graph_uncapped keeps the r9 fence as the baseline.",
    "ann_recall_at_k": "Measured ANN recall (r8 third batch): the exact ground-truth arm scores n x |Q| rows with |Q| FIXED (<= 20 anchors by predicate), then finds each anchor's top-10 via the TWO-PHASE top-k — per-(qid, partition) local top-10s first, global merge over 10*partitions rows — so no single-qid window ever receives all n rows (the classic top-k skew funnel; partition-invariance is tested). The approx arm touches only the anchor's IVF cluster (assignment rewired r9 to the shared two-level quantizer). Recall itself is a k-row join + count.",
    "centroid_outlier_prune": "Semantic-outlier prune (r8 third batch): centroid build is the embedding_centroids partial-aggregated (label,pos) shuffle; scoring is ONE linear scan against broadcast centroids (persisted — three consumers must see identical rounded csims); the per-label decile is a VALUE threshold read off the (label, rounded-csim) histogram whose cardinality is bounded at 20001 rows/label — a per-label row-rank window would funnel n rows into |labels| tasks.",
    "boilerplate_strip": "Boilerplate removal (r8 third batch): line_dedup's disjoint-segment explode, a distinct-doc frequency on the segment hash (corpus-growing key), one anti/semi join pair, and a per-doc ORDERED string_agg splice — zero floating point, no pair join; the surviving tail words append via pure slice arithmetic shared with the oracle.",
    "sketch_quantiles": "Mergeable quantile sketch (r8): the bin index is one multiply+divide+floor in codegen; the histogram partial-aggregates map-side so each map task emits <= 256 bins per group across the exchange (hll_distinct's register shape); the quantile pick is a window over <= 256 rows/group. No portable_round anywhere — min/max have no float-sum seam, so parity is exact by construction.",
    "ivf_maintenance": "IVF index ops (r8; assignment rewired r9): the two-level hier assignment replaces flat argmin (the n*k term the wave-11 probe caught at 4.0x — wave 13 measures 2.5x after the rewire), then integer-only status tagging and a k-row decision table with the mean-occupancy total kept IN the plan as a broadcast 1-row aggregate. All flags are exact-integer comparisons.",
    "ann_ivf_hier": "Search through the two-level quantizer (r8): level-1 routes each vector to its top-3 super-cells (collect/sort/slice aggregate — the exchange carries n rows, not n*n_super), level-2 argmins only over the routed cells' centroids; the probed-cluster top-5 is TakeOrderedAndProject. Composes the corpus-scaled-k rule (bounded probe cost) with the sqrt(k)-super routing (n*2sqrt(k) index build) — the shape where BOTH n and k are large.",
    "classifier_calibration": "Classifier QA (r8): two document-keyed partial-aggregated passes (hashed-BoW score, Gopher label) joined on doc_id, then a 10-row reliability rollup — the decile bin is an integer floor of the already-rounded score, so the only float sum is the per-bin mean (portable_rounded).",
    "tfidf_cosine_topk": "Vector-space retrieval (r8): the doc-norm pass is the inverted_index shape (one vocabulary-keyed df join + one doc-keyed aggregate, both partial-aggregated); the numerator joins only the |q|=3 query terms' postings (broadcast qdf); top-k is TakeOrderedAndProject. The query norm derives IN the plan from the same df table — no driver-side constants.",
    "hybrid_rrf3": "3-way rank fusion (r8): each arm (BM25, tf-idf cosine, embedding cosine) is its own LIMITed top-k, so every row_number window runs over <= 10 rows; the fusion is two full-outer joins over <= 3k rows. The corpus-side cost is the arms' shared scans — fusion itself is scale-free.",
    "multimodal_resize": "Arrow-batched resize stage (r8): binary payloads cross the Python boundary once (mapInPandas, the embed-stage shape); the stub transform's output length is pure integer arithmetic over the payload size, which is what makes the oracle engine-portable while the bytes stay opaque. Swap point: operators/multimodal.py::resize_image (Pillow).",
    "embedding_drift": "Drift monitor (r8): two (label,pos) partial-aggregated centroid builds (base half / delta half), centroids quantized to the 1e-4 grain BEFORE the |labels|-row cosine so both engines compare bit-identical vectors. The whole monitoring query moves |labels| rows after the two aggregate shuffles.",
    "pq_recall_trained": "Trained-PQ recall (r8): the one-Lloyd-round training build (shared with pq_encode_trained), then ADC via exact-integer LUT entries — FLOOR(d2*1e4) as BIGINT per (sub_j, code), integer sums per vector, integer ranking keys — so the only cross-engine seam is one FLOOR per 128 LUT values. Measures the training lift the seeded floor numbers point at (shortlist-100 recall 0.6 -> 0.8 at sf0.001).",
    "pq_operating_point": "The measured >=0.9 serving configuration (r9): 3 Lloyd rounds at M=16/D=4/K=64 — each round one linear scan joined to a BROADCAST 1024-row codebook with map-side min_by, update as a (sub_j,code,pos) partial aggregate quantized to the 1e-4 grid and localCheckpoint'ed (1024 rows). Serving: per-query integer LUT sums over the 16-byte codes, shortlist-100 via the TWO-PHASE top-k (per-partition local top-100s, then a merge window over <= 100*partitions rows — never a global sort), exact arm shares the shape. Measured: shortlist recall mean 0.96 / min 0.9 at sf0.1 over 5 queries; probe 3.3x at 16x.",
    "topk_ivf_pq_trained": "The clustered-corpus serving composition (r9): shared hier coarse assignment fences candidates to the query's nprobe=3 probed cells, trained 16x4 ADC scores 16 bytes/candidate against a broadcast integer LUT, exact cosine re-ranks the 100-row shortlist (broadcast semi-join against the full-precision table). Honest number: composed shortlist recall 0.7/0.6/0.5 on this ISOTROPIC corpus vs 1.0 unfenced — the shape serves clustered real-text embeddings; pq_operating_point is this corpus's default.",
    "simhash_hamming_pairs_w64": "The 64-bit geometry rung (r9): two-half fingerprints (fp_hi/fp_lo longs from disjoint md5 hex slices) built by 64 partial-aggregated bit-votes; the pigeonhole band join meets on 4 bands x 16 bits = 65,536 bucket values per band, so bucket population is n/65k and the integer bit_count verify is ~exact-dup-only at any fixture scale (wave-13 probe: 4.6x at 16x vs the 16-bit rung's 67x — the residual growth is the LINEAR fingerprint build). Width derives from corpus size via simhash_geometry().",
    "ivf_pq_operating_curve": "The nprobe/recall/candidate-fraction curve (r10): per-query cell ranking over k broadcast cells, candidates per arm via an equi-join on the routed cell id, ADC sums partial-aggregated per (arm, qid, vec_id), shortlists two-phase — never a global sort. The 'all' arm is the measured >=0.9 operating point (mean 0.96 / min 0.9 at sf0.1); each 2x candidate cut's recall price is a published row.",
    "bitext_margin_pairs": "Margin-based bitext mining (r10, late — the CCMatrix/LASER op, Artetxe & Schwenk ratio margin): cross-shard candidates fenced in the SAME capped (cluster, sub) cells as the knn default (bounded pair volume on any distribution), per-pair cosines quantized ONCE to exact BIGINTs, neighborhood denominators kept as integer SUM+COUNT (order-free), mutuality via two row_number windows over the same candidate set, margin = one division of two exact integers. The fenced cosine join runs once behind a lineage cut and feeds all four consumers.",
    "ivf_recall_clustered": "The curve's clustered regime (r10, late): corpus derived from documents via dyadic md5 geometry (exact in doubles), materialized ONCE behind a lineage cut — without it Catalyst inlines the 32 md5/conv expressions into the n x K assignment cross join (measured 5.1M md5 evals vs 160k rows). Seeds/queries are frozen local relations, routing happens at plan construction, candidates per arm ride one broadcast equi-join on the routed cell, shortlists and ground truth are two-phase top-k. Measured recall 0.96 at cand_frac 0.030 (nprobe=1) at sf0.1 — the regime where IVF pruning earns its keep.",
    "semdedup_capped": "The default's diagnostic twin (ONE shared builder): same capped (cluster, sub) fence with the sub-cell id EXPOSED so the split geometry is oracle-checked per vector. Keep-superset invariant (splitting only removes candidates) pinned by test.",
    "stream_ingest_index": "The reference's raison d'etre as ONE streaming query (r9): suppression and chunk-explode run stream-side as JVM expressions, the embed stage is the md5 featurizer (dyadic-exact, no Python), and foreachBatch performs delta index maintenance — each micro-batch broadcast-joins the 8-row centroid table, argmins via min_by partial agg, and APPENDS to the index (state is the index, not the stream). The plan shown is the post-drain accounting aggregate; 4 real micro-batches via maxFilesPerTrigger=1. Probe: 2.2x at 16x.",
}


def main() -> None:
    from signal_messenger_vector_database_spark.plans.catalog import all_specs
    from signal_messenger_vector_database_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    sf = "/root/testdata/sf0.01"

    out = [
        "# EXPLAIN — physical plans of the flagship queries",
        "",
        "Generated by `tools/dump_plans.py` (sf0.01). What to look for per",
        "plan: `PushedFilters` (predicate pushdown reached the scan),",
        "`ReadSchema` (column pruning), join strategies, and the absence of",
        "unnecessary Exchange operators.",
        "",
    ]
    for name, note in COMMENTARY.items():
        df = specs[name].fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        # keep the operator tree + scan details; drop per-node field dumps
        tree, _, details = plan.partition("\n\n")
        scans = "\n".join(
            line
            for line in details.splitlines()
            if re.match(r"^\(\d+\) Scan", line)
            or "PushedFilters" in line
            or "ReadSchema" in line
        )
        out += [
            f"## {name}",
            "",
            note,
            "",
            "```",
            tree.strip(),
            "",
            scans,
            "```",
            "",
        ]
    with open("EXPLAIN.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote EXPLAIN.md ({len(out)} lines)")


if __name__ == "__main__":
    main()
