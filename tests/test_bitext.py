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

    # the two collections are the corpus's two largest langs (r11):
    # derive them in plain Python from the documents table
    from collections import Counter

    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    lang_of = {r["doc_id"]: r["lang"] for r in docs.collect()}
    counts = Counter(lang_of.values())
    ranked = sorted(counts, key=lambda l: (-counts[l], l))
    lx, ly = ranked[0], ranked[1]

    for r in rows:
        assert lang_of[r.src] == lx and r.src_lang == lx
        assert lang_of[r.tgt] == ly and r.tgt_lang == ly
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
        if lang_of.get(vid) == lx:
            by_cell[cell][0].append(vid)
        elif lang_of.get(vid) == ly:
            by_cell[cell][1].append(vid)
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


def test_bitext_mining_eval_curve_invariants(spark):
    """The planted-ground-truth eval must (a) emit one row per (arm,
    lang) with the accounting identities exact per lang (recall =
    n_correct/n_lang, prec = n_correct/n_mined), (b) be monotone in the
    threshold WITHIN each lang — mined and correct counts nonincreasing
    (margin >= 1 by construction, so the th=1.0 arm is the full mutual
    set), and (c) recover most planted pairs at the mutual-only
    baseline with near-perfect precision, in EVERY lang."""
    from collections import Counter

    from signal_messenger_vector_database_spark.io.sources import load_table
    from signal_messenger_vector_database_spark.plans.retrieval_eval import (
        _BTE_ARMS,
        _bitext_mining_eval,
    )

    n_lang = Counter(
        r["lang"]
        for r in load_table(spark, SF, "documents").select("lang").collect()
    )
    rows = _bitext_mining_eval(spark, SF).collect()
    langs = sorted(n_lang)
    assert sorted((r.th, r.lang) for r in rows) == [
        (th, lang) for th in sorted(_BTE_ARMS) for lang in langs
    ]
    for r in rows:
        assert 0 <= r.n_correct <= r.n_mined
        assert abs(r.recall - r.n_correct / n_lang[r.lang]) < 1e-12
        if r.n_mined:
            assert abs(r.prec - r.n_correct / r.n_mined) < 1e-12
        else:
            assert r.prec == 0.0
    by_lang = {}
    for r in sorted(rows, key=lambda r: (r.lang, r.th)):
        by_lang.setdefault(r.lang, []).append(r)
    for lang, seq in by_lang.items():
        for prev, cur in zip(seq, seq[1:]):
            assert cur.n_mined <= prev.n_mined, lang
            assert cur.n_correct <= prev.n_correct, lang
        base = seq[0]
        assert base.recall >= 0.75 and base.prec >= 0.95, (lang, base)
    # the curve must be LIVE: the top arm prunes real pairs overall
    total_base = sum(seq[0].n_mined for seq in by_lang.values())
    total_top = sum(seq[-1].n_mined for seq in by_lang.values())
    assert total_top < total_base
