"""Invariant tests for the trained-PQ operating point (plans/pq_trained.py).
Oracle equivalence runs via tools/oracle_check at all three fixture scales;
these pin what the oracle compare cannot see: the >=0.9 recall CLAIM the
module is named for, partition-invariance of the two-phase shortlist, and
the integer-ADC / grid-centroid discipline."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_operating_point_recall_meets_claim(spark):
    """The module's reason to exist: shortlist-100 recall >= 0.9 for
    EVERY evaluation query at the smallest fixture (measured 1.0 across
    all five; sf0.1's measured floor is 0.9 — re-run the five-query
    measurement before changing geometry)."""
    from signal_messenger_vector_database_spark.plans.pq_trained import (
        _pq_operating_point,
    )

    rows = _pq_operating_point(spark, SF).collect()
    assert len(rows) == 5
    assert all(r.shortlist_recall >= 0.9 for r in rows), rows


def test_operating_point_is_partition_invariant(spark):
    """The two-phase shortlist uses spark_partition_id(); the result must
    not depend on physical layout."""
    from signal_messenger_vector_database_spark.plans.pq_trained import (
        _pq_operating_point,
    )

    base = {tuple(r) for r in _pq_operating_point(spark, SF).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        narrow = {tuple(r) for r in _pq_operating_point(spark, SF).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == narrow and len(base) == 5


def test_trained_centroids_live_on_grid_and_codes_cover(spark):
    """Every trained centroid element sits on the 1e-4 grid (the
    cross-engine FP contract), and the final assignment emits exactly
    one code per (vec_id, sub_j)."""
    from signal_messenger_vector_database_spark.plans.pq_trained import (
        _OPM,
        _op_trained_parts,
    )

    af, trained = _op_trained_parts(spark, SF)
    bad = trained.select(
        F.explode("cw").alias("v")
    ).filter(F.abs(F.col("v") * 10000 - F.round(F.col("v") * 10000)) > 1e-9)
    assert bad.count() == 0
    n_vec = af.select("vec_id").distinct().count()
    assert af.count() == n_vec * _OPM
    dup = (
        af.groupBy("vec_id", "sub_j").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0


def test_ivf_pq_trained_topk_is_subset_of_probed_clusters(spark):
    """The composed query's results must come only from the probed
    clusters (the fence is real), and the output is exactly top-10 by
    rounded exact cosine."""
    from signal_messenger_vector_database_spark.functions.text import (
        portable_round,
    )
    from signal_messenger_vector_database_spark.functions.vector import (
        cosine_similarity,
    )
    from signal_messenger_vector_database_spark.io.sources import (
        load_table,
        parquet_row_count,
    )
    from signal_messenger_vector_database_spark.operators.ann import (
        hier_super_count,
        ivf_assign_hier,
        ivf_seed_centroids,
        scaled_cluster_count,
    )
    from signal_messenger_vector_database_spark.plans.pq_trained import (
        _QPROBE,
        _topk_ivf_pq_trained,
    )
    from signal_messenger_vector_database_spark.plans.vectorops import (
        _pq_query_vec,
    )

    out = _topk_ivf_pq_trained(spark, SF).collect()
    assert len(out) == 10
    sims = [r.sim for r in out]
    assert sims == sorted(sims, reverse=True)

    n = parquet_row_count(SF, "embeddings")
    k = scaled_cluster_count(n)
    emb = load_table(spark, SF, "embeddings")
    cents = ivf_seed_centroids(emb, k)
    assign = ivf_assign_hier(emb, cents, hier_super_count(k))
    q = F.array(*[F.lit(x) for x in _pq_query_vec()]).cast("array<double>")
    probed = {
        r.cid
        for r in cents.select(
            "cid", portable_round(cosine_similarity("cv", q), 4).alias("qs")
        )
        .orderBy(F.desc("qs"), "cid")
        .limit(_QPROBE)
        .collect()
    }
    cid_of = {r.vec_id: r.cid for r in assign.collect()}
    assert all(cid_of[r.vec_id] in probed for r in out)
