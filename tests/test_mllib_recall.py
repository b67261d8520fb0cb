"""Full-recall check for the MLlib LSH catalog entries (r2 ADVICE item 3).

``brp_lsh_neighbors`` and ``minhash_lsh_mllib`` are paired with EXACT
brute-force SQL oracles on the assumption that their LSH params achieve
recall 1.0 at oracle scale (sf0.01).  LSH is approximate, so a fixture
regeneration or an MLlib hash-family change could silently flip those
rows red (or coincidentally green).  These tests pin the assumption in
CI: the LSH candidate sets must contain EVERY true neighbor pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.io.sources import load_table
from tests.conftest import SF_MED


def test_brp_lsh_full_recall_at_oracle_scale(spark):
    from signal_messenger_vector_database_spark.plans.mllib_lsh import (
        _brp_lsh_neighbors,
    )

    got = {
        (r["id_a"], r["id_b"])
        for r in _brp_lsh_neighbors(spark, SF_MED).collect()
    }

    emb = load_table(spark, SF_MED, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    dist2 = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("d2", dist2)
        .filter(F.sqrt("d2") < 1.1)
        .select("id_a", "id_b")
        .collect()
    }

    assert exact, "fixture produced zero true neighbor pairs — test is vacuous"
    missed = exact - got
    assert not missed, (
        f"BRP-LSH recall < 1.0 at sf0.01: missed {len(missed)}/{len(exact)} "
        f"true pairs, e.g. {sorted(missed)[:5]}; the exact-SQL oracle "
        "pairing for brp_lsh_neighbors is no longer sound"
    )
    assert got == exact  # threshold agreement both directions


def test_minhash_lsh_full_recall_at_oracle_scale(spark):
    from signal_messenger_vector_database_spark.operators.dedup import shingle_sets
    from signal_messenger_vector_database_spark.plans.mllib_lsh import (
        _minhash_lsh_mllib,
    )
    from signal_messenger_vector_database_spark.plans.similarity import (
        _augmented_docs,
    )

    got = {
        (r["id_a"], r["id_b"])
        for r in _minhash_lsh_mllib(spark, SF_MED).collect()
    }

    docs = _augmented_docs(load_table(spark, SF_MED, "documents"))
    sets = shingle_sets(docs, id_col="doc_id", text_col="text")
    # exact Jaccard via shingle-key equi-join: any pair with distance
    # <= 0.5 shares at least one shingle, so the join loses nothing
    ex = sets.select("doc_id", F.explode("shingles").alias("s"))
    sizes = sets.select("doc_id", F.size("shingles").alias("n"))
    inter = (
        ex.alias("x")
        .join(ex.alias("y"), "s")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in inter.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")),
            "id_b",
        )
        .withColumn(
            "jd",
            1.0
            - F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jd") <= 0.5)
        .select("id_a", "id_b")
        .collect()
    }

    assert exact, "fixture produced zero true near-dup pairs — test is vacuous"
    missed = exact - got
    assert not missed, (
        f"MinHashLSH recall < 1.0 at sf0.01: missed {len(missed)}/{len(exact)} "
        f"true pairs, e.g. {sorted(missed)[:5]}; the exact-SQL oracle "
        "pairing for minhash_lsh_mllib is no longer sound"
    )
