"""Invariant tests for bitext_margin_pairs (margin-based parallel-pair
mining).  Oracle equivalence runs in tools/oracle_check at all three
scales; these pin the structural properties the value-hash cannot see:
side-disjointness, MUTUAL-best-match semantics, the margin arithmetic's
integer-sufficient-statistics identity, and that the threshold is
fixture-live (prunes some mutual pairs and keeps others)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _cosine_int(a, b):
    import math

    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return int(math.floor(dot / (na * nb) * 10000 + 0.5))


def test_bitext_pairs_are_mutual_cross_side_and_above_margin(spark):
    from signal_messenger_vector_database_spark.io.sources import load_table
    from signal_messenger_vector_database_spark.operators.ann import (
        capped_cell_split,
        hier_super_count,
        ivf_assign_hier,
        ivf_seed_centroids,
        scaled_cluster_count,
    )
    from signal_messenger_vector_database_spark.plans.similarity import (
        _BT_K,
        _BT_MARGIN,
        _KNN_CAP,
        _bitext_margin_pairs,
    )

    rows = _bitext_margin_pairs(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.src % 2 == 0 and r.tgt % 2 == 1  # cross-side only
        assert r.margin >= _BT_MARGIN
        assert -1.0 <= r.cos_sim <= 1.0

    # replay the fence + margin math in plain Python over the SAME
    # capped cells and check mutuality, margin values, and liveness
    n = load_table(spark, SF, "embeddings").count()
    k = scaled_cluster_count(n)
    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    assign = ivf_assign_hier(
        emb, ivf_seed_centroids(emb, k), hier_super_count(k), n_centroids=k
    ).withColumnRenamed("cid", "cluster")
    cells = {
        r["vec_id"]: (r["cluster"], r["sub"])
        for r in capped_cell_split(assign, cap=_KNN_CAP).collect()
    }
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    by_cell = defaultdict(lambda: ([], []))
    for vid, cell in cells.items():
        by_cell[cell][vid % 2].append(vid)
    best_x, best_y, hood_x, hood_y = {}, {}, {}, {}
    ci_of = {}
    for cell, (xs, ys) in by_cell.items():
        for sv in xs:
            cands = sorted(
                ((-_cosine_int(vecs[sv], vecs[tv]), tv) for tv in ys)
            )
            if cands:
                ci_of.update({(sv, tv): -c for c, tv in cands})
                best_x[sv] = cands[0][1]
                top = cands[:_BT_K]
                hood_x[sv] = (sum(-c for c, _ in top), len(top))
        for tv in ys:
            cands = sorted(
                ((-_cosine_int(vecs[tv], vecs[sv]), sv) for sv in xs)
            )
            if cands:
                best_y[tv] = cands[0][1]
                top = cands[:_BT_K]
                hood_y[tv] = (sum(-c for c, _ in top), len(top))

    expected = {}
    for sv, tv in best_x.items():
        if best_y.get(tv) != sv:
            continue
        c = ci_of[(sv, tv)]
        sx, kx = hood_x[sv]
        sy, ky = hood_y[tv]
        den = sx * ky + sy * kx
        if den <= 0:
            continue
        import math

        margin = math.floor(2 * c * kx * ky / den * 10000 + 0.5) / 10000
        if margin >= _BT_MARGIN:
            expected[(sv, tv)] = margin
    got = {(r.src, r.tgt): r.margin for r in rows}
    assert got == expected

    # threshold liveness: some mutual pair must fall BELOW the margin
    # bar (otherwise the filter is decorative on this fixture)
    n_mutual = sum(1 for sv, tv in best_x.items() if best_y.get(tv) == sv)
    assert len(rows) < n_mutual
