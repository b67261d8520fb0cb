"""Vector math (E3) against numpy ground truth."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
)
from signal_messenger_vector_database_spark.operators.topk import cosine_topk

SF = "/root/testdata/sf0.001"


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_vector_ops_match_numpy(spark):
    rng = np.random.RandomState(7)
    a, b = rng.randn(16).astype(np.float32), rng.randn(16).astype(np.float32)
    df = spark.createDataFrame(
        [([float(x) for x in a], [float(x) for x in b])],
        "a array<float>, b array<float>",
    )
    row = df.select(
        dot_product("a", "b").alias("dot"),
        l2_norm("a").alias("na"),
        l2_distance("a", "b").alias("dist"),
        cosine_similarity("a", "b").alias("cos"),
    ).first()
    ad, bd = a.astype(np.float64), b.astype(np.float64)
    assert abs(row.dot - ad @ bd) < 1e-9
    assert abs(row.na - np.linalg.norm(ad)) < 1e-9
    assert abs(row.dist - np.linalg.norm(ad - bd)) < 1e-9
    assert abs(row.cos - (ad @ bd) / (np.linalg.norm(ad) * np.linalg.norm(bd))) < 1e-9


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(50, 8).astype(np.float32)
    q = vecs[3]
    df = _vec_df(spark, vecs)
    got = [r.vec_id for r in cosine_topk(df, [float(x) for x in q], k=5).collect()]
    sims = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    expected = list(np.argsort(-np.round(sims, 4), kind="stable")[:5])
    assert got == [int(x) for x in expected]
    assert got[0] == 3  # self-similarity first


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from signal_messenger_vector_database_spark.plans.vectorops import (
        _COV_DIMS,
        _embedding_covariance,
    )

    got = {
        (r["i"], r["j"]): r["cov"]
        for r in _embedding_covariance(spark, SF).collect()
    }
    vecs = np.array(
        [
            r["embedding"][: _COV_DIMS]
            for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        ],
        dtype=np.float64,
    )
    want = np.cov(vecs, rowvar=False, bias=True)
    assert len(got) == _COV_DIMS * (_COV_DIMS + 1) // 2
    for (i, j), v in got.items():
        assert abs(v - want[i, j]) < 1e-3, (i, j, v, want[i, j])
    for i in range(_COV_DIMS):
        assert got[(i, i)] >= 0.0  # variances


def test_random_projection_preserves_norms_in_expectation(spark):
    """Johnson-Lindenstrauss: E[||Px||^2] = ||x||^2 for the scaled
    Rademacher matrix; the corpus-average ratio must sit near 1."""
    import numpy as np

    from signal_messenger_vector_database_spark.plans.vectorops import (
        _random_projection,
    )

    proj = {
        r["vec_id"]: np.array([r[f"p{j}"] for j in range(8)])
        for r in _random_projection(spark, SF).collect()
    }
    orig = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    ratios = [
        float(np.sum(proj[k] ** 2) / np.sum(orig[k] ** 2))
        for k in proj
        if np.sum(orig[k] ** 2) > 0
    ]
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.7 < mean_ratio < 1.3, mean_ratio


def test_pq_adc_recall_against_exact(spark):
    """PQ is lossy by design; assert the ADC top-10 recovers a reasonable
    fraction of the exact L2 top-10 (data-independent codebooks give a
    weaker-than-trained bound, so require overlap >= 2/10 and that ADC
    distances are nonnegative + sorted)."""
    import numpy as np

    from signal_messenger_vector_database_spark.plans.vectorops import (
        _topk_pq_adc,
    )

    adc_rows = _topk_pq_adc(spark, SF).collect()
    dists = [r["adc_dist"] for r in adc_rows]
    assert all(d >= 0 for d in dists)
    assert dists == sorted(dists)
    got = {r["vec_id"] for r in adc_rows}

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    q = vecs[0]
    exact = sorted(vecs, key=lambda k: float(np.sum((vecs[k] - q) ** 2)))[:10]
    assert len(got & set(exact)) >= 2, (sorted(got), exact)
