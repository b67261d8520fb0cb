"""Property tests (SURVEY §5.5): suppression purity, top-k row-order
invariance, portable rounding consistency with DuckDB."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.functions.text import portable_round
from signal_messenger_vector_database_spark.operators.suppression import (
    filter_control_messages,
)
from signal_messenger_vector_database_spark.operators.topk import cosine_topk


def test_suppression_is_pure_function_of_body(spark):
    rows = [(i, b) for i, b in enumerate(
        ["hello", "is typing...", "presage", "Reacted with x", "ok then"] * 4
    )]
    df = spark.createDataFrame(rows, "i long, body string")
    kept1 = sorted(r.i for r in filter_control_messages(df).collect())
    shuffled = df.orderBy(F.rand(7))
    kept2 = sorted(r.i for r in filter_control_messages(shuffled).collect())
    assert kept1 == kept2


def test_topk_invariant_under_row_order(spark):
    rng = np.random.RandomState(5)
    vecs = rng.randn(60, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[7]]
    a = [r.vec_id for r in cosine_topk(df, q, k=8).collect()]
    b = [r.vec_id for r in cosine_topk(df.orderBy(F.rand(11)), q, k=8).collect()]
    assert a == b


@settings(max_examples=30, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_portable_round_matches_duckdb(spark, x):
    """floor(x*10^4+0.5)/10^4 must evaluate identically in Spark and
    DuckDB — the cross-engine property oracle parity rests on."""
    got_spark = spark.range(1).select(
        portable_round(F.lit(x), 4).alias("r")
    ).first().r
    # CAST: a bare literal parses as DECIMAL in DuckDB; oracle inputs are
    # always DOUBLE columns
    got_duck = duckdb.sql(
        f"SELECT floor(CAST({x!r} AS DOUBLE) * 10000.0 + 0.5) / 10000.0"
    ).fetchone()[0]
    assert got_spark == got_duck


def test_sketch_error_bounds(spark):
    """approx_count_distinct (HLL++) and approx_percentile (quantile
    sketch) must land within their documented error envelopes of the
    exact answers — the contract that makes sketches usable at 100 TB
    where exact distinct/percentile would shuffle the world."""
    from signal_messenger_vector_database_spark.io.sources import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    exact_d = li.select(F.countDistinct("l_orderkey")).first()[0]
    approx_d = li.select(F.approx_count_distinct("l_orderkey", rsd=0.02)).first()[0]
    assert abs(approx_d - exact_d) / exact_d < 0.06  # 3x rsd envelope

    exact_p = li.select(F.expr("percentile(l_extendedprice, 0.5)")).first()[0]
    approx_p = li.select(
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)")
    ).first()[0]
    assert abs(approx_p - exact_p) / exact_p < 0.02


# --- BPE engine properties (functions/bpe.py) ----------------------------


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_bpe_count_bounded_and_deterministic(text):
    from signal_messenger_vector_database_spark.functions.bpe import (
        encode_count,
        resolve_ranks,
    )

    ranks = resolve_ranks()
    n1, n2 = encode_count(text, ranks), encode_count(text, ranks)
    assert n1 == n2
    # token count never exceeds the UTF-8 byte length, and is 0 iff the
    # pre-tokenizer finds nothing (empty string only — the cl100k pattern
    # matches any non-empty text somewhere)
    assert n1 <= len(text.encode("utf-8"))
    if text:
        assert n1 >= 1
    else:
        assert n1 == 0


@given(st.text(alphabet=st.characters(codec="ascii"), min_size=1, max_size=80))
@settings(max_examples=100, deadline=None)
def test_bpe_parts_reassemble_to_piece(text):
    """The merge loop partitions the piece: concatenating the parts must
    reproduce the original bytes exactly (nothing lost or duplicated)."""
    import regex

    from signal_messenger_vector_database_spark.functions.bpe import (
        CL100K_PATTERN,
        bpe_parts,
        resolve_ranks,
    )

    ranks = resolve_ranks()
    for m in regex.finditer(CL100K_PATTERN, text):
        piece = m.group().encode("utf-8")
        assert b"".join(bpe_parts(piece, ranks)) == piece


@given(st.lists(st.sampled_from("ab cd ab ef ab cd".split()), min_size=2, max_size=12))
@settings(max_examples=50, deadline=None)
def test_bpe_training_monotonically_compresses(words):
    """More merges never increase the token count of the training text."""
    from signal_messenger_vector_database_spark.functions.bpe import (
        encode_count,
        train_bpe,
    )

    corpus = " ".join(words)
    small = train_bpe([corpus] * 3, n_merges=2)
    large = train_bpe([corpus] * 3, n_merges=32)
    assert encode_count(corpus, large) <= encode_count(corpus, small)


def test_portable_round_cross_engine_parity_bulk(spark):
    """portable_round (floor(x*10^d+0.5)/10^d) must produce IDENTICAL
    doubles in Spark and DuckDB over adversarial values — including the
    .00005-boundary class where the engines' native ROUNDs disagree."""
    import duckdb
    import numpy as np

    from signal_messenger_vector_database_spark.functions.text import (
        portable_round,
    )

    rng = np.random.RandomState(99)
    vals = np.concatenate(
        [
            rng.uniform(-1e6, 1e6, 300),
            rng.uniform(-1, 1, 300),
            # exact half-boundary neighborhoods at 4 decimals
            np.round(rng.uniform(-10, 10, 200), 4) + 0.00005,
        ]
    ).tolist()
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r[0]
        for r in df.select(portable_round(F.col("x"), 4)).collect()
    ]
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT FLOOR(x * 10000 + 0.5) / 10000 FROM (SELECT unnest(?::DOUBLE[]) AS x)",
            params=[vals],
        ).fetchall()
    ]
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=-50, max_value=50)),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=9),
)
def test_global_rank_family_matches_native_windows(spark, keys, width):
    """The two-pass value-bucketed rank family must equal the native
    global-window formulation for ANY key multiset (ties included) and
    ANY bucket width — rank/dense_rank/cume_dist are tie-invariant, and
    ntile uses the tie-broken (key, id) order in both formulations."""
    from pyspark.sql.window import Window

    from signal_messenger_vector_database_spark.operators.ranking import (
        global_rank_family,
    )

    rows = [(i, k[0]) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "rid long, k long")
    got = {
        r.rid: r
        for r in global_rank_family(
            df, order_col="k", id_col="rid", bucket=F.floor(F.col("k") / width)
        ).collect()
    }
    w1 = Window.orderBy("k")
    w2 = Window.orderBy("k", "rid")
    want = {
        r.rid: r
        for r in df.select(
            "rid",
            F.rank().over(w1).cast("long").alias("rk"),
            F.dense_rank().over(w1).cast("long").alias("drk"),
            F.round(F.cume_dist().over(w1), 4).alias("cd"),
            F.ntile(4).over(w2).cast("long").alias("quartile"),
        ).collect()
    }
    assert len(got) == len(want)
    for rid, g in got.items():
        assert tuple(g) == tuple(want[rid]), (rid, g, want[rid])


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40),
    st.floats(min_value=0.01, max_value=0.999),
)
@settings(max_examples=200, deadline=None)
def test_waterfill_closed_form_equals_iterative(tokens, frac):
    """The closed-form saturation rule in token_budget_waterfill
    (sorted-ascending integer inequality + one water level) must equal
    the NAIVE iterative water-filling algorithm — repeatedly cap domains
    at the current uniform level and redistribute — for arbitrary domain
    sizes and budget fractions.  Pure-Python twin of the relational
    plan's math; the relational side is oracle-paired separately."""
    import math

    total = sum(tokens)
    budget = math.floor(total * frac)

    # naive iterative water-filling
    remaining = budget
    unsat = list(range(len(tokens)))
    alloc = [0.0] * len(tokens)
    while unsat:
        level = remaining / len(unsat)
        newly = [i for i in unsat if tokens[i] <= level]
        if not newly:
            for i in unsat:
                alloc[i] = level
            break
        for i in newly:
            alloc[i] = float(tokens[i])
            remaining -= tokens[i]
        unsat = [i for i in unsat if i not in newly]

    # closed form (the plan's math): sort ascending, exact integer test
    order = sorted(range(len(tokens)), key=lambda i: tokens[i])
    D = len(tokens)
    cum = 0
    sat = set()
    for pos, i in enumerate(order, 1):
        if tokens[i] * (D - pos + 1) + cum <= budget:
            sat.add(i)
        cum += tokens[i]
    n_unsat = D - len(sat)
    sat_sum = sum(tokens[i] for i in sat)
    theta = (budget - sat_sum) / n_unsat if n_unsat else None

    for i in range(len(tokens)):
        closed = float(tokens[i]) if i in sat else theta
        if n_unsat == 0:
            # fully saturated corpus: iterative also gave everyone tokens
            assert alloc[i] == float(tokens[i])
        else:
            assert closed is not None
            assert abs(closed - alloc[i]) < 1e-6 * max(1.0, alloc[i]), (
                tokens, frac, i, closed, alloc[i]
            )
    if n_unsat:
        assert abs(sum(
            (float(tokens[i]) if i in sat else theta) for i in range(D)
        ) - budget) < 1e-6 * max(1.0, budget)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["live", "tomb", "new"]),
        ),
        max_size=60,
    )
)
def test_occupancy_cells_matches_python_model(spark, rows):
    """The shared maintenance accounting (ivf_index.occupancy_cells —
    consumed by BOTH the oracle-paired ivf_maintenance query and the
    maintain policy operator) equals a pure-Python model of the
    exact-integer rules on ANY (cid, st) multiset, including empty."""
    from collections import defaultdict

    from signal_messenger_vector_database_spark.operators.ivf_index import (
        occupancy_cells,
    )

    tagged = spark.createDataFrame(rows, "cid long, st string")
    got = {
        r.cid: (r.n_live, r.n_tomb, r.n_new, r.needs_split, r.needs_compact)
        for r in occupancy_cells(tagged).collect()
    }

    counts = defaultdict(lambda: [0, 0, 0])
    for cid, s in rows:
        counts[cid][("live", "tomb", "new").index(s)] += 1
    total = sum(c[0] + c[2] for c in counts.values())
    k = len(counts)
    want = {
        cid: (
            c[0],
            c[1],
            c[2],
            10 * (c[0] + c[2]) * k > 11 * total,
            50 * c[0] < 49 * (c[0] + c[1]),
        )
        for cid, c in counts.items()
    }
    assert got == want
