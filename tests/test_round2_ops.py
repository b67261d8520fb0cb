"""Behavioral invariants for the round-2 operators (retrieval, sketches,
SCD2, quantization, mixture sampling) — complements the DuckDB oracle
pairing with properties the oracle can't express (error bounds, ordering
invariants, split membership).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_scd2_intervals_chain_without_overlap(spark):
    from signal_messenger_vector_database_spark.plans.olap import _scd2_intervals

    out = _scd2_intervals(spark, SF).cache()
    # exactly one open (current) interval per user
    per_user = out.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open")
    )
    assert per_user.filter(F.col("n_open") != 1).count() == 0
    # closed intervals are well-formed and chain: valid_to == next valid_from
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    chained = out.withColumn("next_from", F.lead("valid_from").over(w))
    bad = chained.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    )
    assert bad.count() == 0
    # consecutive states actually differ (change compaction worked)
    runs = chained.withColumn("prev_state", F.lag("state").over(w)).filter(
        F.col("prev_state").isNotNull() & (F.col("state") == F.col("prev_state"))
    )
    assert runs.count() == 0


def test_hll_error_bound_at_higher_cardinality(spark):
    """p=8 HLL has sigma ~= 1.04/sqrt(256) ~= 6.5%; assert a 3-sigma bound
    on a 10k-cardinality synthetic set (well past the linear-counting
    regime, exercising the raw-estimate branch)."""
    from signal_messenger_vector_database_spark.plans.analytics import (
        _HLL_ALPHA,
        _HLL_M,
        _HLL_REM_BITS,
    )

    ids = spark.range(10_000)
    h = F.md5(F.col("id").cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    rem = F.conv(F.substring(h, 3, 10), 16, 10).cast("long")
    bitlen = F.when(rem == 0, F.lit(0)).otherwise(F.length(F.bin(rem)))
    rho = F.lit(_HLL_REM_BITS + 1) - bitlen
    regs = ids.select(bucket.alias("b"), rho.alias("rho")).groupBy("b").agg(
        F.max("rho").alias("mj")
    )
    row = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("z"),
        F.count(F.lit(1)).alias("n_used"),
    ).first()
    est = (_HLL_ALPHA * _HLL_M * _HLL_M) / (row.z + (_HLL_M - row.n_used))
    assert abs(est - 10_000) / 10_000 < 3 * 1.04 / (_HLL_M**0.5)


def test_quantize_error_bounded_by_half_scale(spark):
    """Symmetric int8: per-element |error| <= scale/2, so recon MSE <=
    scale^2/4 for every vector."""
    from signal_messenger_vector_database_spark.plans.vectorops import (
        _embedding_quantize,
    )

    rows = _embedding_quantize(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.recon_mse <= (r.qscale**2) / 4 + 1e-12
        assert all(-127 <= int(q) <= 127 for q in r.qvec.split(","))


def test_bm25_returns_docs_containing_query_terms(spark):
    from signal_messenger_vector_database_spark.io.sources import load_table
    from signal_messenger_vector_database_spark.plans.retrieval import (
        _QUERY,
        _bm25_topk,
    )

    top = _bm25_topk(spark, SF01)
    docs = load_table(spark, SF01, "documents")
    joined = top.join(docs, "doc_id").collect()
    assert len(joined) == 10
    terms = set(_QUERY.split())
    for r in joined:
        assert r.bm25 > 0
        assert terms & set(r.text.lower().split()), r.text


def test_domain_mixture_rates_honored(spark):
    from signal_messenger_vector_database_spark.plans.traindata import (
        _MIXTURE_RATES,
        _domain_mixture,
    )

    rows = {r.source: r for r in _domain_mixture(spark, SF01).collect()}
    # rate 1.0 keeps everything, deterministic
    assert rows["src0"].n_kept == rows["src0"].n_docs
    # other targeted rates achieved within binomial noise (25 docs/source
    # at sf0.01 -> generous tolerance)
    for s, rate in _MIXTURE_RATES.items():
        assert abs(rows[s].achieved_rate - rate) < 0.35


def test_decontaminate_flags_only_train_docs(spark):
    from signal_messenger_vector_database_spark.plans.traindata import (
        _decontaminate,
        _split_assign,
    )
    from signal_messenger_vector_database_spark.io.sources import load_table

    out = _decontaminate(spark, SF01)
    docs = load_table(spark, SF01, "documents").select(
        "doc_id", _split_assign(F.col("doc_id")).alias("split")
    )
    joined = out.join(docs, "doc_id").collect()
    assert joined  # the templated corpus guarantees collisions
    assert all(r.split == "train" for r in joined)
    assert all(r.n_test_collisions >= 1 for r in joined)


def test_bloom_has_no_false_negatives(spark):
    """A Bloom filter may only err positive: every exact member must be
    bloom-positive (n_bloom_positive - n_false_positive == n_exact)."""
    from signal_messenger_vector_database_spark.plans.analytics import (
        _bloom_membership,
    )

    r = _bloom_membership(spark, SF01).first()
    assert r.n_bloom_positive - r.n_false_positive == r.n_exact
    assert 0 <= r.fp_rate < 0.5


def test_cms_never_undercounts(spark):
    from signal_messenger_vector_database_spark.plans.analytics import (
        _cms_heavy_hitters,
    )

    rows = _cms_heavy_hitters(spark, SF01).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.cms_estimate >= r.n_exact
        assert r.overcount >= 0


def test_bloom_fp_rate_null_when_every_probe_is_member(spark):
    """sf0.001 is an all-members corpus (every customer has a >150k
    order): the false-positive RATE is undefined there and must come
    back NULL — under Spark 4's default ANSI mode the unguarded
    division THREW instead (caught by the catalog-wide two-layout
    sweep; the driver's sf0.01 corpus has one non-member so its row
    never exercised this arm)."""
    from signal_messenger_vector_database_spark.plans.analytics import (
        _bloom_membership,
    )

    row = _bloom_membership(spark, "/root/testdata/sf0.001").collect()[0]
    assert row.n_probe == row.n_exact == 150
    assert row.fp_rate is None
