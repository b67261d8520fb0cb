"""kmeans_fit: Lloyd iterations must monotonically decrease inertia and
produce a total, deterministic assignment."""

from __future__ import annotations

from signal_messenger_vector_database_spark.io.sources import load_table
from signal_messenger_vector_database_spark.operators.clustering import kmeans_fit

SF = "/root/testdata/sf0.001"


def test_kmeans_converges(spark):
    emb = load_table(spark, SF, "embeddings")
    assigned, history = kmeans_fit(spark, emb, k=5, max_iter=6)
    # inertia never increases (Lloyd's invariant)
    assert all(b <= a * (1 + 1e-9) for a, b in zip(history, history[1:])), history
    assert len(history) >= 2
    # total assignment: every vector exactly once, clusters in range
    n = emb.count()
    assert assigned.count() == n
    clusters = {r.cluster for r in assigned.select("cluster").distinct().collect()}
    assert clusters <= set(range(5))


def test_kmeans_deterministic(spark):
    emb = load_table(spark, SF, "embeddings")
    a1, h1 = kmeans_fit(spark, emb, k=3, max_iter=3)
    a2, h2 = kmeans_fit(spark, emb, k=3, max_iter=3)
    assert h1 == h2
    m1 = {r.vec_id: r.cluster for r in a1.collect()}
    m2 = {r.vec_id: r.cluster for r in a2.collect()}
    assert m1 == m2
