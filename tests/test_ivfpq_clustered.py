"""Invariant tests for the composed IVF-PQ residual serving curve
(plans/ivfpq_clustered.py).  Oracle equivalence runs via
tools/oracle_check at all three fixture scales; these pin what the
oracle compare cannot see: the byte-identity of the generalized PQ
training builders with their historical renderings, the residual-ADC
translation identity the design rests on, and the curve's monotone
candidate growth."""

from __future__ import annotations

import re
import subprocess

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
REPO = __file__.rsplit("/tests/", 1)[0]


def test_generalized_pq_cte_body_renders_historical_sql_byte_identical():
    """``pq_train_cte_body`` parameterizes the Lloyd CTE chain; its
    default rendering through ``_op_trained_cte_body`` must equal the
    pre-refactor text byte-for-byte, or every historical pq_trained
    oracle string silently drifts."""
    from signal_messenger_vector_database_spark.plans.pq_trained import (
        _OPD,
        _OPK,
        _OPM,
        _OPROUNDS,
        _op_trained_cte_body,
        pq_train_cte_body,
    )

    body = _op_trained_cte_body()
    # structure: embeddings-based subs/cb0 prelude, then one (assign,
    # update) CTE pair per round, then the final assignment
    assert body.startswith("d AS (SELECT vec_id, embedding::DOUBLE[]")
    for r in range(1, _OPROUNDS + 1):
        assert f"\na{r} AS (" in body and f"\nt{r} AS (" in body
    assert "\naf AS (" in body
    # the geometry constants are rendered, not hardcoded elsewhere
    assert f"WHERE vec_id < {_OPK}" in body
    assert f"generate_series(0, {_OPM - 1})" in body
    # a different subs prelude touches ONLY the prelude: swapping it
    # back reproduces the default byte-for-byte
    custom = pq_train_cte_body("XPRELUDEX", _OPD, _OPROUNDS)
    prelude = body[: body.index(",\na1 AS (")]
    assert custom.replace("XPRELUDEX", prelude) == body


def test_residual_adc_translation_identity():
    """The design's premise: d2(q, v) == d2(q - c, v - c) exactly in
    IEEE doubles when all operands are dyadic (multiples of 2^-20, the
    corpus grid) — subtraction is exact, so the residual ADC ranks
    exactly as raw ADC would."""
    import itertools
    import random

    rng = random.Random(11)
    for _ in range(200):
        q, v, c = (
            [rng.randrange(0, 2**20) / 2**20 for _ in range(4)]
            for _ in range(3)
        )
        raw = sum((a - b) * (a - b) for a, b in zip(q, v))
        res = sum(
            ((a - z) - (b - z)) * ((a - z) - (b - z))
            for a, b, z in zip(q, v, c)
        )
        assert raw == res


def test_curve_shape_and_serving_claim(spark):
    """Candidate counts grow monotonically with nprobe, recall never
    decreases, and every row's hits are bounded by the 50-hit maximum.
    (The >=0.9-at-<=0.1 serving claim itself is an sf0.1 measurement —
    recorded in the module docstring and SCALING.md — and is not
    asserted at the degenerate 500-row fixture, where topics have ~5
    members and ground truth spans topics.)"""
    from signal_messenger_vector_database_spark.plans.ivfpq_clustered import (
        _ivf_pq_clustered_curve,
    )

    rows = _ivf_pq_clustered_curve(spark, SF).collect()
    assert [r.nprobe for r in rows] == [1, 2, 4, 8]
    cands = [r.sum_cand for r in rows]
    assert cands == sorted(cands)
    recalls = [r.recall_mean for r in rows]
    assert recalls == sorted(recalls)
    assert all(0 <= r.n_hits <= 50 for r in rows)
    assert all(r.recall_min <= r.recall_mean for r in rows)
