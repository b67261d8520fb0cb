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
