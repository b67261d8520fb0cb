"""Invariant tests for the round-8 extension operators (SimHash Hamming
pairs, IVF k-NN graph, incremental rollup maintenance, temperature
mixture).  Oracle equivalence is covered by tools/oracle_check; these pin
the structural properties the oracles cannot see: banding completeness,
fence-exactness of the graph, merge==batch as a plan property, and the
mixture's normalization/monotonicity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# simhash_hamming_pairs


def test_simhash_banding_is_complete(spark):
    """Pigeonhole completeness: the banded candidate join must recall
    EVERY pair within the Hamming ball — compare against the brute-force
    all-pairs bit_count on the fixture fingerprints."""
    from signal_messenger_vector_database_spark.operators.dedup import (
        simhash,
        simhash_hamming_pairs,
    )
    from signal_messenger_vector_database_spark.plans.similarity import (
        _SIMHASH_HAM_MAX,
        _SIMHASH_N_BANDS,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    fp = simhash(docs, id_col="doc_id", text_col="text").cache()
    banded = simhash_hamming_pairs(
        fp, ham_max=_SIMHASH_HAM_MAX, n_bands=_SIMHASH_N_BANDS
    )
    a, b = fp.alias("a"), fp.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("int")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= _SIMHASH_HAM_MAX)
    )
    got = {(r.id_a, r.id_b, r.hamming) for r in banded.collect()}
    want = {(r.id_a, r.id_b, r.hamming) for r in brute.collect()}
    assert got == want and len(want) > 0


def test_simhash_banding_rejects_unsound_geometry(spark):
    """n_bands <= ham_max would silently lose recall (no band need match);
    the operator must refuse rather than return an incomplete pair set."""
    from signal_messenger_vector_database_spark.operators.dedup import (
        simhash,
        simhash_hamming_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(5)
    fp = simhash(docs, id_col="doc_id", text_col="text")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_hamming_pairs(fp, ham_max=3, n_bands=3)
    with pytest.raises(ValueError, match="divisible"):
        simhash_hamming_pairs(fp, ham_max=1, n_bands=5)


def test_simhash_pairs_has_no_cross_join(spark):
    """The scale contract: candidates come from the (band, val) equi-join,
    never a nested-loop all-pairs."""
    from signal_messenger_vector_database_spark.plans.similarity import (
        _simhash_hamming_pairs,
    )

    plan = (
        _simhash_hamming_pairs(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# knn_graph_ivf


def test_knn_graph_matches_within_fence_bruteforce(spark):
    """Fence-exactness for BOTH variants: for every source, the emitted
    top-3 must equal the brute-force rounded-cosine top-3 over its OWN
    fence group's members (the fence is the approximation; inside it
    the graph is exact).  The capped default's fence is the
    (cluster, sub) group from hier assignment + capped_cell_split; the
    uncapped baseline's is the bare hier cluster."""
    from signal_messenger_vector_database_spark.functions.text import (
        portable_round,
    )
    from signal_messenger_vector_database_spark.functions.vector import (
        cosine_similarity,
    )
    from signal_messenger_vector_database_spark.io.sources import (
        parquet_row_count,
    )
    from signal_messenger_vector_database_spark.operators.ann import (
        capped_cell_split,
        hier_super_count,
        ivf_assign_hier,
        ivf_seed_centroids,
        scaled_cluster_count,
    )
    from signal_messenger_vector_database_spark.plans.similarity import (
        _KNN_CAP,
        _knn_graph_ivf,
        _knn_graph_uncapped,
    )
    from pyspark.sql.window import Window

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    k = scaled_cluster_count(parquet_row_count(SF, "embeddings"))
    assign = ivf_assign_hier(
        emb, ivf_seed_centroids(emb, k), hier_super_count(k)
    ).withColumnRenamed("cid", "cluster")

    def brute(fenced, fence_cols):
        v = fenced.join(emb, "vec_id")
        a = v.select(
            F.col("vec_id").alias("src"),
            F.col("embedding").alias("va"),
            *fence_cols,
        )
        b = v.select(
            F.col("vec_id").alias("nbr"),
            F.col("embedding").alias("vb"),
            *fence_cols,
        )
        w = Window.partitionBy("src").orderBy(F.desc("sim"), F.col("nbr"))
        return (
            a.join(b, fence_cols)
            .filter(F.col("src") != F.col("nbr"))
            .select(
                "src",
                "nbr",
                portable_round(cosine_similarity("va", "vb"), 4).alias("sim"),
            )
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
        )

    got = {(r.src, r.rk, r.nbr) for r in _knn_graph_ivf(spark, SF).collect()}
    want = {
        (r.src, r.rk, r.nbr)
        for r in brute(
            capped_cell_split(assign, cap=_KNN_CAP), ["cluster", "sub"]
        ).collect()
    }
    assert got == want

    got_u = {
        (r.src, r.rk, r.nbr) for r in _knn_graph_uncapped(spark, SF).collect()
    }
    want_u = {
        (r.src, r.rk, r.nbr) for r in brute(assign, ["cluster"]).collect()
    }
    assert got_u == want_u
    # the split is fixture-live, so the two fences must actually differ
    assert got != got_u


def test_knn_graph_shape_invariants(spark):
    """Ranks are 1..k contiguous per source, neighbor != source, sims
    non-increasing in rank, every vector appears as a source."""
    from signal_messenger_vector_database_spark.plans.similarity import (
        _knn_graph_ivf,
    )

    rows = _knn_graph_ivf(spark, SF).collect()
    by_src: dict[int, list] = {}
    for r in rows:
        assert r.nbr != r.src
        by_src.setdefault(r.src, []).append(r)
    n_vec = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(by_src) == n_vec  # every cluster has >= 4 members at fixture scale
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.sim for r in rs]
        assert sims == sorted(sims, reverse=True)


# ---------------------------------------------------------------------------
# rollup_incremental


def test_rollup_incremental_merge_equals_batch(spark):
    """merge(partial(base), partial(delta)) == direct one-pass aggregate —
    exactly, row for row, because the sufficient statistics are integers.
    This is the Spark-side twin of the oracle's full-recompute check."""
    from signal_messenger_vector_database_spark.plans.analytics import (
        _rollup_incremental,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    direct = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents) / 100.0).alias("total_value"),
    )
    got = {tuple(r) for r in _rollup_incremental(spark, SF).collect()}
    want = {tuple(r) for r in direct.collect()}
    assert got == want and len(want) > 0


def test_rollup_incremental_plan_has_two_aggregate_stages(spark):
    """The plan must actually BE incremental: two partial aggregations
    unioned then re-aggregated (a plan that just recomputed from the full
    table would have a single aggregate over one scan)."""
    from signal_messenger_vector_database_spark.plans.analytics import (
        _rollup_incremental,
    )

    plan = (
        _rollup_incremental(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Union" in plan


# ---------------------------------------------------------------------------
# mixture_temperature


def test_mixture_temperature_invariants(spark):
    """Weights normalize to 1 (up to the 1e-4 output grain x D), every
    domain gets positive weight, and alpha=1/2 compresses the range:
    larger domains get larger weight but strictly smaller boost."""
    from signal_messenger_vector_database_spark.plans.traindata import (
        _mixture_temperature,
    )

    rows = _mixture_temperature(spark, SF).collect()
    assert len(rows) == 20
    total_w = sum(r.weight for r in rows)
    assert abs(total_w - 1.0) <= 1e-4 * len(rows)
    ordered = sorted(rows, key=lambda r: r.n_chars_tot)
    for small, big in zip(ordered, ordered[1:]):
        if small.n_chars_tot == big.n_chars_tot:
            continue
        assert small.weight <= big.weight
        assert small.boost >= big.boost
    # temperature up-samples the smallest domain, down-samples the largest
    assert ordered[0].boost > 1.0 > ordered[-1].boost


# ---------------------------------------------------------------------------
# epoch_repeat_plan


def test_epoch_repeat_realizes_boost(spark):
    """Per doc, n_repeats is floor(boost) or floor(boost)+1; per domain,
    the realized mass sits within binomial noise of boost * n_docs; and
    the plan is shuffle-free sampling (broadcast join only)."""
    from signal_messenger_vector_database_spark.plans.traindata import (
        _epoch_repeat_plan,
        _mixture_temperature,
    )
    import math

    boosts = {r.source: r.boost for r in _mixture_temperature(spark, SF).collect()}
    rows = _epoch_repeat_plan(spark, SF).collect()
    assert len(rows) == 500
    per_domain: dict[str, list] = {}
    for r in rows:
        b = boosts[r.source]
        assert r.n_repeats in (math.floor(b), math.floor(b) + 1)
        per_domain.setdefault(r.source, []).append(r.n_repeats)
    for src, reps in per_domain.items():
        want = boosts[src] * len(reps)
        # 4-sigma binomial bound on the fractional coin
        tol = 4 * math.sqrt(len(reps) * 0.25) + 1
        assert abs(sum(reps) - want) <= tol, (src, sum(reps), want)


def test_epoch_repeat_plan_is_broadcast_only(spark):
    from signal_messenger_vector_database_spark.plans.traindata import (
        _epoch_repeat_plan,
    )

    plan = (
        _epoch_repeat_plan(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_simhash_banding_complete_at_wide_geometry(spark):
    """Same completeness proof at the 32-bit geometry (256 buckets/band):
    widening the fingerprint changes the bucket key cardinality, not the
    pigeonhole guarantee."""
    from signal_messenger_vector_database_spark.operators.dedup import (
        simhash,
        simhash_hamming_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    fp = simhash(docs, id_col="doc_id", text_col="text", bits=32).cache()
    banded = simhash_hamming_pairs(fp, ham_max=1, n_bands=4, fp_bits=32)
    a, b = fp.alias("a"), fp.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("int")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 1)
    )
    got = {(r.id_a, r.id_b, r.hamming) for r in banded.collect()}
    want = {(r.id_a, r.id_b, r.hamming) for r in brute.collect()}
    assert got == want and len(want) > 0


def test_simhash_rejects_bad_bit_widths(spark):
    from signal_messenger_vector_database_spark.operators.dedup import simhash

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(5)
    with pytest.raises(ValueError, match="multiple of 4"):
        simhash(docs, id_col="doc_id", text_col="text", bits=30)
    with pytest.raises(ValueError, match="multiple of 4"):
        simhash(docs, id_col="doc_id", text_col="text", bits=64)
