"""Behavioral invariants for the stats/DQ module (plans/stats.py) —
complements the DuckDB oracle pairing with ground-truth checks (numpy
closed form, monotonicity, conservation) the oracle can't express.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_ols_matches_numpy_closed_form(spark):
    import numpy as np

    from signal_messenger_vector_database_spark.plans.stats import _ols_regression

    out = {r["l_returnflag"]: r for r in _ols_regression(spark, SF).collect()}
    rows = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (float(r["l_quantity"]), float(r["l_extendedprice"]))
        )
    for flag, pts in by_flag.items():
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        slope, intercept = np.polyfit(x, y, 1)
        got = out[flag]
        assert got["n"] == len(pts)
        assert math.isclose(got["slope"], slope, rel_tol=1e-3, abs_tol=1e-3)
        assert math.isclose(got["intercept"], intercept, rel_tol=1e-3, abs_tol=1e-2)
        assert 0.0 <= got["r2"] <= 1.0


def test_zscore_outliers_are_actual_outliers(spark):
    from signal_messenger_vector_database_spark.plans.stats import _zscore_outliers

    flagged = _zscore_outliers(spark, SF).cache()
    assert flagged.filter(F.abs(F.col("z")) < 2.5).count() == 0
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # flagged rows must be a small minority (the tails)
    assert flagged.count() < 0.05 * ev.count()
    # spot-verify one flagged row against directly computed stats
    row = flagged.orderBy("event_id").first()
    if row is not None:
        stats = (
            ev.filter(F.col("event_type") == row["event_type"])
            .agg(F.avg("value").alias("mu"), F.stddev_pop("value").alias("s"))
            .first()
        )
        val = (
            ev.filter(F.col("event_id") == row["event_id"]).select("value").first()[0]
        )
        z = (val - stats["mu"]) / stats["s"]
        assert math.isclose(row["z"], z, abs_tol=1e-3)


def test_cumulative_distinct_conserves_and_is_monotone(spark):
    from signal_messenger_vector_database_spark.plans.stats import (
        _cumulative_distinct,
    )

    out = _cumulative_distinct(spark, SF).orderBy("hour").collect()
    total_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["new_users"] for r in out) == total_users
    assert out[-1]["cum_users"] == total_users
    running = 0
    for r in out:
        running += r["new_users"]
        assert r["cum_users"] == running  # exact prefix sum, strictly increasing


def test_dq_audit_reports_every_check_on_clean_fixture(spark):
    from signal_messenger_vector_database_spark.plans.stats import _dq_audit

    rows = {r["check"]: r["violations"] for r in _dq_audit(spark, SF).collect()}
    assert set(rows) == {
        "lineitem.negative_price",
        "lineitem.discount_out_of_range",
        "lineitem.null_orderkey",
        "orders.duplicate_orderkey",
        "orders.orphan_custkey",
        "customer.duplicate_custkey",
    }
    # the generated fixture satisfies all constraints — audit must agree
    assert all(v == 0 for v in rows.values()), rows


def test_dq_audit_detects_injected_violations(spark, tmp_path):
    """Corrupt a copy of the fixture and assert the audit catches each
    injected defect class (the clean-fixture test alone can't prove the
    checks fire)."""
    import shutil

    from signal_messenger_vector_database_spark.plans.stats import _dq_audit

    d = tmp_path / "dirty"
    d.mkdir()
    for t in ("lineitem", "orders", "customer"):
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")

    li = spark.read.parquet(f"{SF}/lineitem.parquet").limit(3)
    bad_li = li.withColumn("l_extendedprice", F.lit(-5.0)).withColumn(
        "l_discount", F.lit(2.0)
    )
    li.unionByName(bad_li).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    dup = orders.limit(2)  # duplicated keys
    orphan = orders.limit(1).withColumn("o_custkey", F.lit(-999))
    orders.unionByName(dup).unionByName(orphan).write.mode("overwrite").parquet(
        str(d / "orders.parquet")
    )

    rows = {r["check"]: r["violations"] for r in _dq_audit(spark, str(d)).collect()}
    assert rows["lineitem.negative_price"] == 3
    assert rows["lineitem.discount_out_of_range"] == 3
    assert rows["orders.duplicate_orderkey"] == 2
    assert rows["orders.orphan_custkey"] == 1
    assert rows["customer.duplicate_custkey"] == 0


def test_collocations_pmi_shape_and_order(spark):
    from signal_messenger_vector_database_spark.plans.textanalysis import (
        _collocations_pmi,
    )

    rows = _collocations_pmi(spark, SF).collect()
    assert 0 < len(rows) <= 20
    assert all(r["c_vw"] >= 5 for r in rows)
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_fuzzy_dedup_banding_loses_nothing_within_block(spark):
    """The (token, length-band) candidate generation must find EXACTLY the
    brute-force pairs that share the blocking token — banding with
    adjacent-band explosion is lossless for edit distance <= 3."""
    from signal_messenger_vector_database_spark.plans.similarity import (
        _fuzzy_dedup_edit,
    )

    got = {
        (r["p1"], r["p2"]) for r in _fuzzy_dedup_edit(spark, SF).collect()
    }
    part = spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_name")
    a = part.select(F.col("p_partkey").alias("p1"), F.col("p_name").alias("n1"))
    b = part.select(F.col("p_partkey").alias("p2"), F.col("p_name").alias("n2"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("p1") < F.col("p2"))
        .filter(
            F.element_at(F.split("n1", " "), -1)
            == F.element_at(F.split("n2", " "), -1)
        )
        .filter(F.col("n1") != F.col("n2"))
        .filter(F.levenshtein("n1", "n2") <= 3)
    )
    want = {(r["p1"], r["p2"]) for r in brute.collect()}
    assert got == want


def test_weighted_sample_matches_python_ground_truth(spark):
    """Recompute the A-Res keys in pure Python (hashlib md5) and assert
    the engine selected exactly the 10 smallest-key docs."""
    import hashlib
    import math as m

    from signal_messenger_vector_database_spark.plans.stats import _weighted_sample

    got = [r["doc_id"] for r in _weighted_sample(spark, SF).collect()]
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "n_chars"
    ).collect()
    keys = []
    for r in docs:
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16)
        u = (h + 0.5) / 65536.0
        w = max(float(r["n_chars"]), 1.0)
        key = m.floor((-m.log(u) / w) * 1e8 + 0.5) / 1e8
        keys.append((key, r["doc_id"]))
    want = [d for _, d in sorted(keys)[:10]]
    assert got == want


def test_mad_outliers_flags_are_above_threshold_and_minority(spark):
    from signal_messenger_vector_database_spark.plans.stats import _mad_outliers

    flagged = _mad_outliers(spark, SF).cache()
    assert flagged.filter(F.col("robust_z") <= 3.0).count() == 0
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert flagged.count() < 0.2 * n_events


def test_zipf_fit_slope_negative_fit_valid(spark):
    from signal_messenger_vector_database_spark.plans.stats import _zipf_fit

    row = _zipf_fit(spark, SF).first()
    assert row["n_words"] > 10
    assert row["slope"] < 0  # frequency decreases with rank, always
    assert 0.0 <= row["r2"] <= 1.0


def test_pagerank3_positive_ordered_deterministic(spark):
    from signal_messenger_vector_database_spark.plans.graph import _pagerank3

    rows = _pagerank3(spark, SF).collect()
    assert len(rows) == 20
    prs = [r["pr"] for r in rows]
    assert all(p > 0 for p in prs)
    assert prs == sorted(prs, reverse=True)
    # deterministic across plan re-executions
    rows2 = _pagerank3(spark, SF).collect()
    assert [(r["node"], r["pr"]) for r in rows] == [
        (r["node"], r["pr"]) for r in rows2
    ]


def test_first_touch_attribution_window_and_bounds(spark):
    from signal_messenger_vector_database_spark.plans.analytics import (
        _first_touch_attribution,
    )

    rows = _first_touch_attribution(spark, SF).collect()
    assert rows, "no attributed purchases at sf0.001"
    for r in rows:
        assert 0 <= r["secs_after_click"] <= 3600
        assert r["click_id"] != r["purchase_id"]


def test_range_partition_bounds_monotone(spark):
    from signal_messenger_vector_database_spark.plans.scale_queries import (
        _range_partition_bounds,
    )

    rows = _range_partition_bounds(spark, SF).orderBy("bound_idx").collect()
    assert len(rows) == 31
    bounds = [r["bound"] for r in rows]
    assert bounds == sorted(bounds)


def test_incremental_new_docs_conserves(spark):
    from signal_messenger_vector_database_spark.plans.traindata import (
        _incremental_new_docs,
    )

    for r in _incremental_new_docs(spark, SF).collect():
        assert r["n_new"] + r["n_already_seen"] == r["n_batch"]


def test_inverted_index_invariants(spark):
    from signal_messenger_vector_database_spark.plans.retrieval import (
        _inverted_index,
    )

    rows = _inverted_index(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["df"] >= 10
        assert r["total_tf"] >= r["df"]  # tf >= 1 per posting
        p = [int(x) for x in r["top_postings"].split(",")]
        assert 1 <= len(p) <= 5 and p == sorted(p)
