"""MLlib LSH surface — the SURVEY §2.7/E3 scale path via Spark ML:
BucketedRandomProjectionLSH (L2) and MinHashLSH (Jaccard) with fixed
seeds.  Deterministic given the seed; the returned distances are exact
(MLlib re-ranks LSH candidates on the raw vectors), and the LSH params
are sized for full recall at oracle scale, so each entry is paired with
an exact-SQL twin (see the oracle note below).  Tests additionally
measure recall against the exact operators.

Scale note: these FIXED knobs (bucketLength=1.0, numHashTables) are the
oracle-scale demonstration of the MLlib API, not the corpus-growth
story — a fixed bucket geometry means bucket population grows linearly
with n and the candidate join quadratically.  The production-scale
variant is operators/ann.py::lsh_cosine_pairs sized by ``lsh_geometry``
(planes grow log2(n); see tools/scaling_probe.py for the measured
blow-up that motivated it); for MLlib, shrink bucketLength ~ n^(-1/planes)
or raise numHashTables equivalently.
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
        bucketLength=1.0, numHashTables=10, seed=_SEED,
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
        bucketLength=1.0, numHashTables=10, seed=_SEED,
    )
    model = lsh.fit(emb)
    key = emb.filter(F.col("vec_id") == 0).first()["features"]
    nn = model.approxNearestNeighbors(emb, key, numNearestNeighbors=10)
    return nn.select("vec_id", F.round("distCol", 4).alias("dist")).orderBy(
        "dist", "vec_id"
    )


# Oracles (VERDICT r1 task 6): the LSH hash families are engine-specific,
# but every distance MLlib *returns* is exact (computed on the raw vectors
# over LSH candidates).  With seeds pinned, the output is deterministic; at
# the driver's sf0.01 the candidate sets achieve full recall (verified by
# tools/oracle_check.py before pairing), so the exact-SQL twin matches.
# If a future fixture breaks recall, demote the entry back to rows-only.

_BRP_LSH_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS dist
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) < 1.1
ORDER BY id_a, id_b
"""

_ANN_POINT_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       ROUND(list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 4) AS dist
FROM embeddings e, q
ORDER BY dist, vec_id
LIMIT 10
"""


def _minhash_mllib_sql() -> str:
    from .similarity import _SQL_AUGMENTED_DOCS, _sql_shingle_cte

    return f"""
WITH t AS ({_sql_shingle_cte(table=f"({_SQL_AUGMENTED_DOCS})")})
SELECT sa.doc_id AS id_a, sb.doc_id AS id_b,
       ROUND(1.0 - CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
             (len(sa.shingles) + len(sb.shingles)
              - len(list_intersect(sa.shingles, sb.shingles))), 4) AS jaccard_dist
FROM t sa JOIN t sb ON sa.doc_id < sb.doc_id
WHERE 1.0 - CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
            (len(sa.shingles) + len(sb.shingles)
             - len(list_intersect(sa.shingles, sb.shingles))) < 0.5
ORDER BY id_a, id_b
"""


SPECS: dict[str, QuerySpec] = {
    "brp_lsh_neighbors": QuerySpec(_brp_lsh_neighbors, _BRP_LSH_SQL, "MLlib BucketedRandomProjectionLSH approxSimilarityJoin (L2), exact-recall oracle"),
    "minhash_lsh_mllib": QuerySpec(_minhash_lsh_mllib, _minhash_mllib_sql(), "MLlib MinHashLSH approx Jaccard join, exact-recall oracle"),
    "ann_point_query": QuerySpec(_ann_point_query, _ANN_POINT_SQL, "MLlib approxNearestNeighbors single-vector lookup, exact top-k oracle"),
}
