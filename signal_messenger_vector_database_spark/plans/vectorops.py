"""Bulk vector operators over the embeddings table (E3 family).

The reference declares a VECTOR(768) column and installs pgvector but
never computes over it (SURVEY §2.7).  These queries are the *bulk* vector
analytics a 100 TB embedding store needs beyond top-k:

- ``embedding_centroids``: per-label element-wise mean.  Relational
  formulation — ``posexplode`` then a plain two-key aggregate — so the
  whole thing is one shuffle on (label, pos) with map-side partial
  aggregation; no Python, no per-group collect.  At 768 dims x millions of
  rows the explode multiplies row count but each row is 16 bytes and the
  partial aggregate collapses them before the exchange.
- ``kmeans_assign``: one k-means assignment step — distance of every
  vector to every centroid via a broadcast cross join (k rows), argmin by
  a window-free ``min_by``.  This is the building block of iterative
  clustering done Spark-first: the per-iteration state (centroids) is tiny
  and broadcast; the big side is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_round
from ..io.sources import load_table
from .registry import QuerySpec


def _exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    )


def _embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _exploded(spark, sf_dir)
        .groupBy("label", "pos")
        .agg(
            portable_round(F.avg("val"), 4).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


_CENTROIDS_SQL = """
SELECT label, u.pos - 1 AS pos,
       FLOOR(AVG(u.val) * 10000 + 0.5) / 10000 AS centroid,
       COUNT(*) AS n_vectors
FROM (
  SELECT label,
         unnest(list_transform(embedding,
                (x, i) -> struct_pack(pos := i, val := x))) AS u
  FROM embeddings
)
GROUP BY 1, 2
"""


def _kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Centroids = per-label means (the result of one "update" step).
    centroids = (
        _exploded(spark, sf_dir)
        .groupBy(F.col("label").alias("c_label"), "pos")
        .agg(F.avg("val").alias("cval"))
        .groupBy("c_label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("pv"))
        .select("c_label", F.col("pv.cval").alias("centroid"))
    )
    # Assignment step: squared L2 to each centroid, keep the argmin.
    d2 = F.aggregate(
        F.zip_with("embedding", "centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        emb.join(F.broadcast(centroids))
        .select(
            "vec_id",
            "label",
            "c_label",
            portable_round(d2, 4).alias("d2"),
        )
    )
    return (
        scored.groupBy("vec_id", "label")
        .agg(
            F.min_by("c_label", F.struct("d2", "c_label")).alias("assigned"),
            F.min("d2").alias("best_d2"),
        )
    )


# DuckDB twin: same centroid CTE, cross join, list-fold distance, argmin
# via min_by over the (distance, label) pair for identical tie-breaks.
_KMEANS_ASSIGN_SQL = """
WITH expl AS (
  SELECT label AS c_label,
         unnest(list_transform(embedding,
                (x, i) -> struct_pack(pos := i, val := x))) AS u
  FROM embeddings
),
cent AS (
  SELECT c_label,
         list(AVG_val ORDER BY pos) AS centroid
  FROM (
    SELECT c_label, u.pos AS pos, AVG(u.val) AS AVG_val
    FROM expl GROUP BY 1, 2
  )
  GROUP BY c_label
),
scored AS (
  SELECT e.vec_id, e.label, c.c_label,
         FLOOR(list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> (e.embedding[i] - c.centroid[i]) * (e.embedding[i] - c.centroid[i])))
               * 10000 + 0.5) / 10000 AS d2
  FROM embeddings e CROSS JOIN cent c
)
SELECT vec_id, label, c_label AS assigned, d2 AS best_d2
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY d2, c_label) AS rn
      FROM scored)
WHERE rn = 1
"""


def _kmeans_fit_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Lloyd's loop (operators/clustering.py): deterministic init,
    iterate until inertia stabilizes, return the final assignment.
    Non-SQL-expressible (driver-side iteration) => rows-only check."""
    from ..operators.clustering import kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _history = kmeans_fit(spark, emb, k=8, max_iter=5)
    return assigned


SPECS: dict[str, QuerySpec] = {
    "kmeans_fit_assign": QuerySpec(
        _kmeans_fit_assign,
        None,
        "full iterative k-means fit (Lloyd), final assignment",
    ),
    "embedding_centroids": QuerySpec(
        _embedding_centroids,
        _CENTROIDS_SQL,
        "per-label element-wise centroid via posexplode + two-key agg",
    ),
    "kmeans_assign": QuerySpec(
        _kmeans_assign,
        _KMEANS_ASSIGN_SQL,
        "one k-means assignment step: broadcast centroids, min_by argmin",
    ),
}
