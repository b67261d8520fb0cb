"""MLlib LSH surface — the SURVEY §2.7/E3 scale path via Spark ML:
BucketedRandomProjectionLSH (L2) and MinHashLSH (Jaccard) with fixed
seeds.  Deterministic given the seed, but the hash families are
engine-specific, so these are rows-only entries; tests measure recall
against the exact operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from .registry import QuerySpec

_SEED = 42


def _to_mllib_vectors(emb: DataFrame) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return emb.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )


def _brp_lsh_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approxSimilarityJoin under L2: pairs within distance threshold."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    emb = _to_mllib_vectors(load_table(spark, sf_dir, "embeddings"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=0.5, numHashTables=4, seed=_SEED,
    )
    model = lsh.fit(emb)
    pairs = model.approxSimilarityJoin(emb, emb, threshold=1.1, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("id_a"),
            F.col("datasetB.vec_id").alias("id_b"),
            F.round("dist", 4).alias("dist"),
        )
        .orderBy("id_a", "id_b")
    )


def _minhash_lsh_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH over sparse shingle vectors: approx Jaccard join
    on the planted-dup corpus (cf. plans/similarity.py)."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from ..operators.dedup import shingle_sets
    from .similarity import _augmented_docs

    docs = _augmented_docs(load_table(spark, sf_dir, "documents"))
    sets = shingle_sets(docs, id_col="doc_id", text_col="text")
    cv = CountVectorizer(inputCol="shingles", outputCol="features", binary=True)
    model = cv.fit(sets)
    vecs = model.transform(sets).select("doc_id", "features")
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=_SEED)
    lsh_model = lsh.fit(vecs)
    pairs = lsh_model.approxSimilarityJoin(vecs, vecs, threshold=0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .orderBy("id_a", "id_b")
    )


def _ann_point_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approxNearestNeighbors: the single-query ANN point lookup (the
    online-serving shape; Spark's answer is batch, but the API exists)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    emb = _to_mllib_vectors(load_table(spark, sf_dir, "embeddings"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=0.5, numHashTables=4, seed=_SEED,
    )
    model = lsh.fit(emb)
    key = emb.filter(F.col("vec_id") == 0).first()["features"]
    nn = model.approxNearestNeighbors(emb, key, numNearestNeighbors=10)
    return nn.select("vec_id", F.round("distCol", 4).alias("dist")).orderBy(
        "dist", "vec_id"
    )


SPECS: dict[str, QuerySpec] = {
    "brp_lsh_neighbors": QuerySpec(_brp_lsh_neighbors, None, "MLlib BucketedRandomProjectionLSH approxSimilarityJoin (L2)"),
    "minhash_lsh_mllib": QuerySpec(_minhash_lsh_mllib, None, "MLlib MinHashLSH approx Jaccard join"),
    "ann_point_query": QuerySpec(_ann_point_query, None, "MLlib approxNearestNeighbors single-vector lookup"),
}
