"""Invariant tests for the round-3 operator additions (graph, sequence,
and dedup families).  Oracle equivalence is covered by tools/oracle_check;
these pin structural properties the oracles cannot see."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_triangle_count_equi_joins_only(spark):
    """Degree-oriented counting must never form a theta join: every join
    in the plan is hash/merge on keys (the naive a<b<c triple join would
    show a BroadcastNestedLoopJoin / CartesianProduct on the filters)."""
    from signal_messenger_vector_database_spark.plans.graph import _triangle_count

    df = _triangle_count(spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n = df.collect()[0]["n_triangles"]
    assert n > 0, "fixture co-order graph unexpectedly triangle-free"


def test_triangle_count_matches_naive(spark):
    """Cross-check the oriented-wedge count against the naive a<b<c
    triple join at sf0.001 (small enough for the naive form)."""
    from signal_messenger_vector_database_spark.plans.graph import (
        _co_order_edges,
        _triangle_count,
    )

    e = _co_order_edges(spark, SF)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    naive = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .count()
    )
    assert _triangle_count(spark, SF).collect()[0]["n_triangles"] == naive


def test_bfs_khops_frontier_invariants(spark):
    from signal_messenger_vector_database_spark.plans.graph import (
        _BFS_HOPS,
        _BFS_SRC,
        _bfs_khops,
    )

    rows = _bfs_khops(spark, SF).collect()
    dist = {r["node"]: r["hops"] for r in rows}
    assert dist[_BFS_SRC] == 0
    assert len(dist) == len(rows), "duplicate nodes in BFS output"
    assert all(0 <= h <= _BFS_HOPS for h in dist.values())
    # bipartite supplier<->customer graph: parity of hops matches side
    for node, h in dist.items():
        assert (h % 2 == 0) == (node[0] == _BFS_SRC[0]), (node, h)


def test_chunk_overlap_stride_and_coverage(spark):
    from signal_messenger_vector_database_spark.plans.traindata import (
        _OVL_SIZE,
        _OVL_STRIDE,
        _chunk_overlap,
    )

    rows = _chunk_overlap(spark, SF).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        # chunk sizes follow min(size, n_doc_words - start) exactly
        last = chunks[-1]
        n_doc = _OVL_STRIDE * last["chunk_id"] + last["n_words"]
        for c in chunks:
            assert c["n_words"] == min(_OVL_SIZE, n_doc - _OVL_STRIDE * c["chunk_id"])
        # consecutive chunks overlap by (size - stride) words
        for a, b in zip(chunks, chunks[1:]):
            wa, wb = a["chunk_text"].split(" "), b["chunk_text"].split(" ")
            k = len(wa) - _OVL_STRIDE  # overlap actually present
            if k > 0:
                assert wa[_OVL_STRIDE:] == wb[:k]


def test_cusum_drift_bounds(spark):
    from signal_messenger_vector_database_spark.plans.stats import _cusum_drift

    rows = _cusum_drift(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["cusum_max"] > 0
        assert 0 <= r["n_alarms"] <= r["n_events"]


def test_sorted_neighborhood_finds_planted_dups(spark):
    from signal_messenger_vector_database_spark.plans.similarity import (
        _sorted_neighborhood,
    )

    rows = _sorted_neighborhood(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 0 <= r["edit_dist"] <= 5
    # the planted duplicate (same text + suffix) shares the 40-char
    # prefix, so it must surface as an edit_dist-0 pair with its source
    planted = {
        (r["id_a"], r["id_b"]) for r in rows if r["edit_dist"] == 0
    }
    assert any(b == a + 1_000_000 for a, b in planted), planted


def test_shingle_containment_planted_is_superset(spark):
    from signal_messenger_vector_database_spark.plans.similarity import (
        _shingle_containment,
    )

    rows = _shingle_containment(spark, SF).collect()
    assert rows
    got = {(r["id_a"], r["id_b"]): r["containment"] for r in rows}
    # original's shingles are a subset of its planted copy's:
    # containment(orig -> planted) == 1.0 exactly
    full = [
        (a, b) for (a, b), c in got.items() if b == a + 1_000_000 and c == 1.0
    ]
    assert full, got


def test_winsorized_stats_bounds_and_clamp_rates(spark):
    from signal_messenger_vector_database_spark.plans.stats import (
        _winsorized_stats,
    )

    rows = _winsorized_stats(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["p05"] <= r["p95"]
        assert r["p05"] <= r["winsorized_mean"] <= r["p95"]
        n = r["n_clamped_low"] + r["n_clamped_high"]
        assert n > 0, "5/95 winsorization should clamp some rows"
