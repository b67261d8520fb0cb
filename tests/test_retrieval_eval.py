"""Invariant tests for the retrieval-evaluation queries (ann_recall_at_k,
hard_negative_mining) and vocab_coverage.  Oracle equivalence is covered by
tools/oracle_check at all three fixture scales; these pin the structural
properties the oracle compare cannot see: partition-invariance of the
two-phase exact top-k, the similarity band + fence of the mined negatives,
and the coverage accounting identity."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_ann_recall_two_phase_topk_is_partition_invariant(spark):
    """The exact arm keeps per-partition local top-10s before the global
    merge, so ``spark_partition_id()`` appears in the plan — the result
    must nonetheless be independent of the physical layout.  Replaying the
    whole query under a different shuffle width must give identical rows."""
    from signal_messenger_vector_database_spark.plans.retrieval_eval import (
        _ann_recall_at_k,
    )

    base = {tuple(r) for r in _ann_recall_at_k(spark, SF).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        narrow = {tuple(r) for r in _ann_recall_at_k(spark, SF).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == narrow and len(base) > 0


def test_ann_recall_exact_arm_matches_single_window_topk(spark):
    """The two-phase (local top-k per partition, then merge) exact ground
    truth must equal the naive single-window top-k — the optimization is
    a physical rewrite, not a semantic one."""
    from pyspark.sql import Window

    from signal_messenger_vector_database_spark.functions.text import (
        portable_round,
    )
    from signal_messenger_vector_database_spark.functions.vector import (
        cosine_similarity,
    )
    from signal_messenger_vector_database_spark.io.sources import load_table
    from signal_messenger_vector_database_spark.plans.retrieval_eval import (
        _ANCHOR_PRED,
        _RECALL_K,
        _ivf_pieces,
    )

    emb = load_table(spark, SF, "embeddings")
    anchors = emb.filter(F.expr(_ANCHOR_PRED)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            portable_round(cosine_similarity("embedding", "qv"), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vec_id")
    naive = {
        (r.qid, r.vec_id)
        for r in scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _RECALL_K)
        .select("qid", "vec_id")
        .collect()
    }

    # re-derive the two-phase exact set exactly as the query builds it
    scored2 = scored.withColumn("pid", F.spark_partition_id())
    w1 = Window.partitionBy("qid", "pid").orderBy(F.desc("sim"), "vec_id")
    local = (
        scored2.withColumn("rk", F.row_number().over(w1))
        .filter(F.col("rk") <= _RECALL_K)
        .drop("pid", "rk")
    )
    two_phase = {
        (r.qid, r.vec_id)
        for r in local.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _RECALL_K)
        .select("qid", "vec_id")
        .collect()
    }
    assert naive == two_phase

    # sanity: the pieces builder agrees on the anchor set
    _, a2, _ = _ivf_pieces(spark, SF)
    assert {r.qid for r in a2.collect()} == {q for q, _ in naive}


def test_hard_negatives_live_in_band_and_fence(spark):
    """Every mined negative sits inside [LO, HI) — below the near-dup bar
    with margin, above the too-easy floor — comes from the anchor's own
    IVF cluster, never the anchor itself, at most K per anchor."""
    from signal_messenger_vector_database_spark.io.sources import (
        load_table,
        parquet_row_count,
    )
    from signal_messenger_vector_database_spark.operators.ann import (
        ivf_assign,
        ivf_seed_centroids,
        scaled_cluster_count,
    )
    from signal_messenger_vector_database_spark.plans.retrieval_eval import (
        _HARDNEG_HI,
        _HARDNEG_K,
        _HARDNEG_LO,
        _hard_negative_mining,
    )

    rows = _hard_negative_mining(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert _HARDNEG_LO <= r.sim < _HARDNEG_HI
        assert r.neg_id != r.qid
    from collections import Counter

    per_anchor = Counter(r.qid for r in rows)
    assert max(per_anchor.values()) <= _HARDNEG_K

    n = parquet_row_count(SF, "embeddings")
    emb = load_table(spark, SF, "embeddings")
    centroids = ivf_seed_centroids(emb, scaled_cluster_count(n))
    cluster_of = {r.vec_id: r.cid for r in ivf_assign(emb, centroids).collect()}
    for r in rows:
        assert cluster_of[r.neg_id] == cluster_of[r.qid]


def test_vocab_coverage_accounting_identity(spark):
    """oov_rate == n_oov / n_tokens per doc; totals reconcile with the
    corpus token count; a doc made only of top-V words has oov_rate 0."""
    from signal_messenger_vector_database_spark.functions.text import (
        whitespace_words,
    )
    from signal_messenger_vector_database_spark.io.sources import load_table
    from signal_messenger_vector_database_spark.plans.retrieval_eval import (  # noqa: F401  (module import sanity)
        _RECALL_K,
    )
    from signal_messenger_vector_database_spark.plans.textanalysis import (
        _vocab_coverage,
    )

    cov = _vocab_coverage(spark, SF).collect()
    assert len(cov) > 0
    for r in cov:
        assert 0 <= r.n_oov <= r.n_tokens
        assert abs(r.oov_rate - r.n_oov / r.n_tokens) < 1e-12

    docs = load_table(spark, SF, "documents")
    total_tokens = (
        docs.select(
            F.explode(whitespace_words(F.lower(F.col("text")))).alias("w")
        ).count()
    )
    assert sum(r.n_tokens for r in cov) == total_tokens
    # the top-V vocabulary covers the most frequent words, so SOME doc
    # must have a sub-1 oov rate, and no rate exceeds 1 by construction
    assert min(r.oov_rate for r in cov) < 1.0


def test_ivf_hier_agreement_floor_and_validity(spark):
    """The two-level quantizer's shipped geometry (n_super = floor
    sqrt(k), nprobe=3) must agree with flat assignment on >= 0.8 of
    vectors even on the isotropic fixture (the routing worst case), and
    every hier-assigned cid must be a real centroid id."""
    import math

    from signal_messenger_vector_database_spark.io.sources import (
        load_table,
        parquet_row_count,
    )
    from signal_messenger_vector_database_spark.operators.ann import (
        ivf_assign_hier,
        ivf_seed_centroids,
        scaled_cluster_count,
    )
    from signal_messenger_vector_database_spark.plans.retrieval_eval import (
        _ivf_hier_quality,
    )

    row = _ivf_hier_quality(spark, SF).collect()[0]
    assert row.agree_frac >= 0.8
    assert row.n_agree <= row.n

    n = parquet_row_count(SF, "embeddings")
    k = scaled_cluster_count(n)
    emb = load_table(spark, SF, "embeddings")
    hier = ivf_assign_hier(
        emb, ivf_seed_centroids(emb, k), max(2, math.isqrt(k))
    ).collect()
    assert len(hier) == n  # exactly one assignment per vector
    assert all(0 <= r.cid < k for r in hier)


def test_ivf_recall_clustered_curve_shape(spark):
    """The clustered-corpus operating curve must (a) be monotone — recall
    and candidate fraction both nondecreasing in nprobe, (b) show the
    clustering SIGNAL the query exists to demonstrate: recall_mean far
    above the candidate fraction at every nprobe (on the isotropic
    fixture the curve sits at recall ~ 1.4x cand_frac; here the topic
    structure must put it at >= 5x), and (c) keep every recall in
    [0, 1] with sum_cand consistent with cand_frac."""
    from signal_messenger_vector_database_spark.io.sources import (
        parquet_row_count,
    )
    from signal_messenger_vector_database_spark.plans.retrieval_eval import (
        _CL_NQ,
        _ivf_recall_clustered,
    )

    rows = sorted(
        _ivf_recall_clustered(spark, SF).collect(), key=lambda r: r.nprobe
    )
    assert [r.nprobe for r in rows] == [1, 2, 4, 8]
    n = parquet_row_count(SF, "documents")
    for prev, cur in zip(rows, rows[1:]):
        assert cur.recall_mean >= prev.recall_mean
        assert cur.sum_cand >= prev.sum_cand
    for r in rows:
        assert 0.0 <= r.recall_min <= r.recall_mean <= 1.0
        assert abs(r.cand_frac - r.sum_cand / (_CL_NQ * n)) < 1e-12
    # the clustered-corpus claim, asserted where pruning is most
    # aggressive (nprobe=1; at high nprobe recall saturates at 1.0 so
    # the ratio necessarily collapses toward 1/cand_frac): routing
    # recovers far more recall per candidate than the isotropic
    # corpus's ~1.4x — the headline is high recall at a few percent
    # of the corpus
    assert rows[0].recall_mean >= 5 * rows[0].cand_frac
    assert rows[0].recall_mean >= 0.7 and rows[0].cand_frac <= 0.08


def test_clustered_dyadic_arithmetic_is_exact_across_runtimes(spark):
    """ivf_recall_clustered ranks query routing at PLAN time in Python,
    trusting that every dyadic component and squared-L2 fold replays the
    exact doubles Spark (and therefore the DuckDB oracle) computes.
    That claim is mathematical (components are multiples of 2^-20 with
    bounded magnitude, so all sums stay exact in 53-bit significands) —
    this test pins it empirically: Spark-evaluated vectors and pair
    distances must equal the pure-Python replay BIT-FOR-BIT (==, no
    tolerance), including across fold orders."""
    import hashlib

    from pyspark.sql import functions as F

    from signal_messenger_vector_database_spark.plans.retrieval_eval import (
        _CL_D,
        _cl_d2,
        _cl_vec,
    )

    topics = [f"lang{i % 7}|src{i % 13}" for i in range(40)] + [
        "unié|中文",  # non-ASCII survives UTF-8 md5 on both sides
        "x|y",
    ]
    rows = [(i, t, f"d{i}") for i, t in enumerate(topics)]
    df = spark.createDataFrame(rows, "rid int, topic string, tag string")
    got = {
        r["rid"]: r["v"]
        for r in df.select(
            "rid", _cl_vec(F.col("topic"), F.col("tag")).alias("v")
        ).collect()
    }

    def h4(s: str) -> int:
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:4], 16)

    def py_vec(topic: str, tag: str) -> list[float]:
        return [
            h4(f"{topic}:{i}") / 65536.0
            + (h4(f"{tag}:{i}") / 65536.0 - 0.5) / 16.0
            for i in range(_CL_D)
        ]

    expect = {i: py_vec(t, g) for i, t, g in rows}
    assert got == expect  # exact equality, every component

    # pair distances: Spark's zip_with/aggregate fold == Python's
    # left-to-right sum, exactly, for every consecutive pair
    pairs = spark.createDataFrame(
        [(i, expect[i], expect[i + 1]) for i in range(len(rows) - 1)],
        "rid int, a array<double>, b array<double>",
    )
    got_d2 = {
        r["rid"]: r["d2"]
        for r in pairs.select("rid", _cl_d2("a", "b").alias("d2")).collect()
    }
    for i in range(len(rows) - 1):
        acc = 0.0
        for x, y in zip(expect[i], expect[i + 1]):
            acc += (x - y) * (x - y)
        assert got_d2[i] == acc  # bit-exact
        # fold-order independence (the sums are exact): reversed order
        # must give the identical double
        racc = 0.0
        for x, y in reversed(list(zip(expect[i], expect[i + 1]))):
            racc += (x - y) * (x - y)
        assert racc == acc
