"""IVF-PQ with RESIDUAL encoding, measured on the clustered corpus —
the composed production serving stack (VERDICT r10 #1).

The two r10 curves each told half the story: ``ivf_pq_operating_curve``
(trained 16x4 PQ, isotropic embeddings) reaches >=0.9 recall only at
candidate fraction 1.0 — a full ADC scan — and ``ivf_recall_clustered``
(clustered corpus, exact cosines) reaches 0.96 at 0.030 but with no
compression.  This module composes them into the stack a production
deployment would actually serve, and adds the piece that makes the
composition work: **residual encoding** (Jegou, Douze & Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 — the
public FAISS ``IVFADC`` design).  Each vector is PQ-encoded as
``v - centroid(cell(v))`` instead of raw ``v``: squared L2 is
translation-invariant per cell (``d2(q, v) = d2(q - c, v - c)``), so
ADC against the query's per-cell residual is exactly the raw-vector
ADC — but the codebooks now spend their resolution on the WITHIN-cell
structure instead of re-encoding the cell centers the IVF stage
already resolved.  On a clustered corpus that is the difference
between codewords that straddle topic clumps and codewords that rank
within them.

Serving stack measured here, every stage the production shape:
  corpus     the deterministic clusterable corpus of
             ``ivf_recall_clustered`` (topic = lang|source), widened to
             64 dims so the measured 16x4 PQ geometry applies — dyadic
             md5 grid, exact in doubles on both engines;
  IVF        corpus-scaled k (``scaled_cluster_count``) seeded cells,
             two-level hier assignment (``ivf_assign_hier`` /
             ``ivf_sql.hier_assign_ctes`` — the shared builders);
  PQ         16 subspaces x 4 dims, 64 data-seeded codewords, 2 Lloyd
             rounds (``pq_train_inplace`` / ``pq_train_cte_body``) over
             the RESIDUAL subvector table;
  query      5 frozen topic-center queries, cells ranked by cosine,
             nprobe in {1, 2, 4, 8} — measured at sf0.1: recall 1.0
             (min 1.0) at candidate fraction 0.042 (nprobe=2), the
             >=0.9-at-<=0.1 serving point; 0.76 at 0.024 (nprobe=1);
  ADC        per-(query, probed-cell) integer LUT over the query
             residual — exact BIGINT sums (the pq_trained discipline);
  shortlist  100-deep two-phase top-k, then exact-d2 recall@10 vs the
             exact full-corpus ground truth (re-rank restores true
             order within the shortlist, so shortlist recall IS the
             two-stage recall).

Scale shape: corpus projection is linear codegen (16 md5/row — the
CHUNKED dyadic builder, one md5 per 8 dims; the per-dim form blew the
janino method limit and fell back to interpreted eval, 12.4 s vs
3.9 s cold at sf0.1) behind a lineage cut; assignment is the shared n*(1+nprobe)*sqrt(k) two-level
build; training state is M*K = 1024 tiny arrays (broadcast, in-place
assignment — zero corpus shuffles per round); candidates are an
equi-join on the routed cell; LUT is <= |Q| * nprobe_max * M * K rows
(broadcast).  Nothing quadratic, nothing unbounded collected (the
probed-cell collect is <= 40 rows of eval-frozen constants).

Reference parity note: the reference installs pgvectorscale's DiskANN
extension and never builds or queries an index (src/rag/sqlx.rs:22-29);
this is the north-star serving capability measured end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import portable_round
from ..io.sources import load_table, parquet_row_count
from .registry import QuerySpec

SPECS: dict[str, QuerySpec] = {}

_RC_D = 64  # corpus dims = _RCM * _RCSUB (the measured 16x4 geometry)
_RCM, _RCSUB = 16, 4
_RCK = 64  # codewords per subspace
_RCROUNDS = 2  # Lloyd rounds (training cost is per-round linear; two
#                rounds already move every seeded codeword onto the
#                residual distribution — measured no recall change vs 3)
_RC_NQ = 5
_RC_ARMS = (1, 2, 4, 8)
_RC_SHORT = 100
_RC_TOPK = 10


def _rc_vec(topic, tag):
    """The 64-dim dyadic vector, CHUNKED: one md5 yields EIGHT 4-hex
    dims (offsets 0/4/…/28) instead of `_cl_vec`'s one-md5-per-dim —
    16 md5s/row instead of 128, and an expression tree small enough
    for whole-stage codegen (the per-dim form blew janino's method
    limit and fell back to interpreted eval: 12.4 s -> 3.9 s cold for
    the sf0.1 projection, measured).  Same dyadic grid: every
    component is center/2^16 + (pert/2^16 - 0.5)/16, exact in doubles.
    hex -> int via conv() — value-identical to the instr arithmetic
    the oracle twin renders (both parse the same 4 hex chars)."""
    dims = []
    for c in range(_RC_D // 8):
        hc = F.md5(F.concat(topic, F.lit(f":{c}")))
        hp = F.md5(F.concat(tag, F.lit(f":{c}")))
        for j in range(8):
            cen = F.conv(F.substring(hc, j * 4 + 1, 4), 16, 10).cast("double")
            per = F.conv(F.substring(hp, j * 4 + 1, 4), 16, 10).cast("double")
            dims.append(
                cen / F.lit(65536.0)
                + (per / F.lit(65536.0) - F.lit(0.5)) / F.lit(16.0)
            )
    return F.array(*dims)


def _rc_vec_expr(topic_sql: str, tag_sql: str) -> "Column":
    """``_rc_vec`` rendered as ONE ``F.expr`` string (r15): composing
    the 64-dim chunked projection out of individual Column ops cost
    seconds of py4j round-trips per query build (the ivf_recall_
    clustered measurement); the rendered string parses in milliseconds
    and evaluates the identical conv/substring/md5 arithmetic —
    bit-identical values, oracle unchanged."""
    dims = []
    for c in range(_RC_D // 8):
        hc = f"md5(concat({topic_sql}, ':{c}'))"
        hp = f"md5(concat({tag_sql}, ':{c}'))"
        for j in range(8):
            cen = f"CAST(conv(substring({hc}, {j * 4 + 1}, 4), 16, 10) AS DOUBLE)"
            per = f"CAST(conv(substring({hp}, {j * 4 + 1}, 4), 16, 10) AS DOUBLE)"
            dims.append(
                f"{cen} / 65536.0D + ({per} / 65536.0D - 0.5D) / 16.0D"
            )
    return F.expr("array(" + ", ".join(dims) + ")")


def _rc_vec_py(topic: str, tag: str) -> list:
    """Driver-side Python replay of ``_rc_vec`` (r15): every component
    is a dyadic rational (multiple of 2^-20, < ~1.07), exact in IEEE
    doubles, so Python reproduces the engine columns bit-for-bit — the
    frozen 5-query eval constants no longer need a collect job that
    re-analyzed and re-ran the 16-md5 projection for 5 rows."""
    import hashlib

    out = []
    for c in range(_RC_D // 8):
        hc = hashlib.md5(f"{topic}:{c}".encode()).hexdigest()
        hp = hashlib.md5(f"{tag}:{c}".encode()).hexdigest()
        for j in range(8):
            cen = int(hc[j * 4 : (j + 1) * 4], 16)
            per = int(hp[j * 4 : (j + 1) * 4], 16)
            out.append(cen / 65536.0 + (per / 65536.0 - 0.5) / 16.0)
    return out


def _rc_sql_corpus_cte(
    name: str, id_expr: str, tag: str, where: str = ""
) -> str:
    """DuckDB twin of _rc_vec as a full CTE: the 16 per-chunk md5s are
    hoisted into an inner SELECT (one column each) so the hex-to-int
    arithmetic references COLUMNS — the naive inline form re-rendered
    each md5 inside every instr term (512 evaluations/row, measured 4x
    oracle slowdown).  ``_sql_hexn`` is the shared offset-capable
    hex-to-int SQL."""
    from .similarity import _sql_hexn

    hcols = []
    for c in range(_RC_D // 8):
        hcols.append(f"md5(topic || ':{c}') AS hc{c}")
        hcols.append(f"md5({tag} || ':{c}') AS hp{c}")
    dims = []
    for c in range(_RC_D // 8):
        for j in range(8):
            dims.append(
                f"{_sql_hexn(f'hc{c}', 4, j * 4 + 1)} / 65536.0 + "
                f"({_sql_hexn(f'hp{c}', 4, j * 4 + 1)} / 65536.0 - 0.5) / 16.0"
            )
    return f"""{name} AS (
  SELECT vid AS {"vec_id" if name == "rcorpus" else "qid"},
         [{", ".join(dims)}] AS {"embedding" if name == "rcorpus" else "qv"}
  FROM (
    SELECT {id_expr} AS vid, {", ".join(hcols)}
    FROM docs{where}
  )
)"""


def _rc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 64-dim clusterable corpus: ``ivf_recall_clustered``'s dyadic
    geometry (topic center + per-doc perturbation) at _RC_D dims via
    the chunked builder, with (vec_id, embedding) columns so the shared
    hier/capped builders apply verbatim.  Lineage-cut: the projection
    must materialize once, not inline into the assignment cross join."""
    from ..io.sources import ensure_parallelism

    # spread the single-file docs scan BEFORE the 16-md5/row projection
    # (one input partition serialized it on one core of local[32])
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.concat_ws("|", "lang", "source").alias("topic")
        )
    )
    return docs.select(
        F.col("doc_id").alias("vec_id"),
        _rc_vec_expr(
            "topic", "concat('r', CAST(doc_id AS STRING))"
        ).alias("embedding"),
    ).localCheckpoint(eager=False)


# the exact squared-L2 fold is retrieval_eval's _cl_d2 (ONE definition
# — the shared-definition rule)
from .retrieval_eval import _cl_d2 as _rc_d2  # noqa: E402,F401
from .retrieval_eval import d2_unrolled as _rc_d2_unrolled  # noqa: E402


def _ivf_pq_clustered_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import cosine_similarity
    from ..operators.ann import hier_super_count, scaled_cluster_count
    from ..operators.ranking import two_phase_topk

    n = parquet_row_count(sf_dir, "documents")
    k = scaled_cluster_count(n)
    vecs = _rc_corpus(spark, sf_dir)
    # seed centroids straight off the k-row FILTERED docs scan instead
    # of through the vecs checkpoint (r16): ivf_seed_centroids(vecs, k)
    # forced the probed-cells job below to materialize the WHOLE n-row
    # corpus projection just to read k seed rows — the doc_id < k
    # predicate now pushes down to the parquet scan and the projection
    # runs on k rows.  Identical doubles: _rc_vec_expr is a pure
    # function of (topic, 'r'+doc_id), so filtering before or after
    # the projection yields the same rows bit-for-bit.
    cents = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < k)
        .select(
            "doc_id", F.concat_ws("|", "lang", "source").alias("topic")
        )
        .select(
            F.col("doc_id").alias("cid"),
            _rc_vec_expr(
                "topic", "concat('r', CAST(doc_id AS STRING))"
            ).alias("cv"),
        )
    )
    # lineage cut: the assignment feeds the residual table AND the
    # candidate join — without it the two-level build runs per branch.
    # Routed through the r11 build-once index seam (inline when
    # SMVD_IVF_CACHE_DIR is unset).
    from ..operators.ivf_index import shared_hier_assignment

    assign = shared_hier_assignment(
        spark, vecs, f"{sf_dir}/documents|rcorpus|{n}", k, hier_super_count(k)
    ).localCheckpoint(eager=False)

    # residual subvector table: r = v - centroid(cell(v)), exact in
    # doubles (both operands are multiples of 2^-20), sliced into the
    # 16x4 geometry — the ONLY change vs raw-vector PQ training
    res = (
        assign.join(vecs, "vec_id")
        .join(F.broadcast(cents), "cid")
        .select(
            "vec_id",
            F.zip_with("embedding", "cv", lambda a, b: a - b).alias("rv"),
        )
    )
    subs = res.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_RCM - 1}), "
                f"j -> slice(rv, j * {_RCSUB} + 1, {_RCSUB}))"
            )
        ).alias("sub_j", "sv"),
    ).localCheckpoint(eager=False)
    from ..operators.ivf_index import shared_pq_parts

    af, cb = shared_pq_parts(
        spark, subs, f"{sf_dir}/documents|rcorpus-resid|{n}",
        _RCSUB, _RCK, _RCROUNDS,
    )

    # five frozen topic-center queries: computed driver-side in PYTHON
    # from the 5 topic strings (r15 — ``_rc_vec_py`` replays the dyadic
    # arithmetic bit-identically; the old collect job re-analyzed and
    # re-ran the 16-md5 projection just to fetch 5 rows)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.concat_ws("|", "lang", "source").alias("topic")
    )
    q_rows = [
        (int(r["doc_id"]), _rc_vec_py(r["topic"], f"q{r['doc_id']}"))
        for r in docs.filter(F.col("doc_id") < _RC_NQ).collect()
    ]
    queries = spark.createDataFrame(q_rows, "qid int, qv array<double>")

    # cell routing: rank ALL k cells per query by cosine (the assignment
    # metric), keep the union of arms (rk <= max nprobe); the probed set
    # is <= |Q| * 8 rows of frozen eval constants — collect it WITH the
    # centroid vectors to assemble the per-(query, cell) residual LUT
    wq = Window.partitionBy("qid").orderBy(F.desc("qsim"), "cid")
    probed = (
        cents.crossJoin(F.broadcast(queries))
        .select(
            "qid",
            "cid",
            "cv",
            portable_round(cosine_similarity("cv", F.col("qv")), 4).alias(
                "qsim"
            ),
        )
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= max(_RC_ARMS))
    )
    qv_by_id = dict(q_rows)
    probed_rows = [
        (r["qid"], r["cid"], r["rk"], r["cv"]) for r in probed.collect()
    ]
    # query-residual subvectors per probed cell: qr = qv - cv (exact
    # dyadic subtraction, Python == engine doubles), sliced 16x4
    qsub = spark.createDataFrame(
        [
            (
                qid,
                cid,
                j,
                [
                    qv_by_id[qid][j * _RCSUB + i] - cv[j * _RCSUB + i]
                    for i in range(_RCSUB)
                ],
            )
            for qid, cid, _, cv in probed_rows
            for j in range(_RCM)
        ],
        "qid int, cid long, sub_j int, qsv array<double>",
    )
    from .pq_trained import _op_d2

    lut = cb.join(F.broadcast(qsub), "sub_j").select(
        "qid",
        "cid",
        "sub_j",
        "code",
        F.floor(_op_d2("qsv", "cw") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("ld"),
    )

    arms = spark.createDataFrame([(a,) for a in _RC_ARMS], "np int")
    probed_arm = spark.createDataFrame(
        [
            (np, qid, cid)
            for np in _RC_ARMS
            for qid, cid, rk, _ in probed_rows
            if rk <= np
        ],
        "np int, qid int, cid long",
    )
    # lineage cut: cand feeds the ADC branch AND the candidate count
    cand = (
        assign.join(F.broadcast(probed_arm), "cid")
        .select("np", "qid", "vec_id", "cid")
        .localCheckpoint(eager=False)
    )
    # broadcast the candidate set (r16, guide §3.1): cand is bounded by
    # |Q| * Σnp * cell-size (the scaled-k rule caps cells), so at any
    # corpus size the ADC join should leave the n*M-row code table af
    # UNSHUFFLED — the default plan shuffled both sides on vec_id.
    dists = (
        af.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(lut), ["qid", "cid", "sub_j", "code"])
        .groupBy("np", "qid", "vec_id")
        .agg(F.sum("ld").alias("adc"))
    )
    keyed = dists.withColumn("_g", F.concat_ws("#", "np", "qid"))
    short = two_phase_topk(
        keyed, "_g", [F.asc("adc"), F.asc("vec_id")], _RC_SHORT
    ).select("np", "qid", "vec_id")

    exact = two_phase_topk(
        vecs.crossJoin(F.broadcast(queries)).select(
            "qid", "vec_id", _rc_d2_unrolled("embedding", "qv", _RC_D).alias("d2")
        ),
        "qid",
        [F.asc("d2"), F.asc("vec_id")],
        _RC_TOPK,
    ).select("qid", "vec_id")

    hits = (
        short.join(F.broadcast(exact), ["qid", "vec_id"])
        .groupBy("np", "qid")
        .agg(F.count(F.lit(1)).alias("nh"))
    )
    # tiny derived aggregates: explicit broadcasts (the EXPLAIN-audit
    # class — Catalyst has no stats for either side)
    grid = arms.crossJoin(F.broadcast(queries.select("qid")))
    perq = grid.join(F.broadcast(hits), ["np", "qid"], "left").select(
        "np", "qid", F.coalesce("nh", F.lit(0)).alias("nh")
    )
    candn = cand.groupBy("np").agg(F.count(F.lit(1)).alias("sum_cand"))
    denom = float(_RC_NQ * _RC_TOPK)
    return (
        perq.groupBy("np")
        .agg(
            F.sum("nh").alias("nht"),
            F.min(F.col("nh").cast("double") / F.lit(float(_RC_TOPK))).alias(
                "recall_min"
            ),
        )
        .join(F.broadcast(candn), "np")
        .select(
            F.col("np").cast("int").alias("nprobe"),
            F.col("sum_cand").cast("long").alias("sum_cand"),
            (
                F.col("sum_cand").cast("double") / F.lit(float(_RC_NQ * n))
            ).alias("cand_frac"),
            F.col("nht").cast("long").alias("n_hits"),
            (F.col("nht").cast("double") / F.lit(denom)).alias("recall_mean"),
            "recall_min",
        )
        .orderBy("nprobe")
    )


def _ivf_pq_clustered_curve_sql() -> str:
    from .ivf_sql import SQL_COS, hier_assign_ctes
    from .pq_trained import pq_train_cte_body

    d2_exact = (
        f"list_sum(list_transform(range(1, {_RC_D + 1}), "
        "i -> (v.embedding[i] - q.qv[i]) * (v.embedding[i] - q.qv[i])))"
    )
    # query-residual ADC entry: ((qv[off+i] - cv[off+i]) - cw[i])^2
    # summed over the subspace — the same left-fold both engines run
    qres_d2 = (
        f"list_sum(list_transform(range(1, {_RCSUB + 1}), i -> "
        f"((q.qv[t.sub_j * {_RCSUB} + i] - c.cv[t.sub_j * {_RCSUB} + i]) - t.cw[i])"
        f" * ((q.qv[t.sub_j * {_RCSUB} + i] - c.cv[t.sub_j * {_RCSUB} + i]) - t.cw[i])))"
    )
    cos_cq = SQL_COS.format(a="c.cv", b="q.qv")
    arm_rows = ", ".join(f"({a})" for a in _RC_ARMS)
    subs_ctes = f"""resid AS (
  SELECT h.vec_id,
         list_transform(range(1, {_RC_D + 1}), i -> r.embedding[i] - c.cv[i]) AS rv
  FROM hier h JOIN rcorpus r USING (vec_id) JOIN c ON c.cid = h.cid_hier
),
subs AS (
  SELECT vec_id, j AS sub_j, rv[j * {_RCSUB} + 1 : j * {_RCSUB} + {_RCSUB}] AS sv
  FROM resid, generate_series(0, {_RCM - 1}) g(j)
),
cb0 AS (SELECT sub_j, CAST(vec_id AS INTEGER) AS code, sv AS cw
        FROM subs WHERE vec_id < {_RCK})"""
    return f"""
WITH docs AS (
  SELECT doc_id, lang || '|' || source AS topic FROM documents
),
{_rc_sql_corpus_cte("rcorpus", "doc_id", "'r' || CAST(doc_id AS VARCHAR)")},
{hier_assign_ctes(src="rcorpus")},
{pq_train_cte_body(subs_ctes, _RCSUB, _RCROUNDS)},
{_rc_sql_corpus_cte("q", "CAST(doc_id AS INTEGER)", "'q' || CAST(doc_id AS VARCHAR)", where=f" WHERE doc_id < {_RC_NQ}")},
probed AS (
  SELECT qid, cid, rk FROM (
    SELECT q.qid, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY FLOOR(({cos_cq}) * 10000 + 0.5) / 10000 DESC, c.cid
           ) AS rk
    FROM c, q
  ) WHERE rk <= {max(_RC_ARMS)}
),
lut AS (
  SELECT q.qid, pr.cid, t.sub_j, t.code,
         CAST(FLOOR({qres_d2} * 10000 + 0.5) AS BIGINT) AS ld
  FROM probed pr
  JOIN c ON c.cid = pr.cid
  JOIN q ON q.qid = pr.qid
  CROSS JOIN t{_RCROUNDS} t
),
arms(np) AS (VALUES {arm_rows}),
cand AS (
  SELECT a.np, pr.qid, h.vec_id, pr.cid
  FROM arms a JOIN probed pr ON pr.rk <= a.np
  JOIN hier h ON h.cid_hier = pr.cid
),
dists AS (
  SELECT cand.np, cand.qid, af.vec_id, SUM(l.ld) AS adc
  FROM af JOIN cand ON af.vec_id = cand.vec_id
  JOIN lut l ON l.qid = cand.qid AND l.cid = cand.cid
            AND l.sub_j = af.sub_j AND l.code = af.code
  GROUP BY 1, 2, 3
),
short AS (
  SELECT np, qid, vec_id FROM (
    SELECT np, qid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY np, qid ORDER BY adc, vec_id) AS rk
    FROM dists
  ) WHERE rk <= {_RC_SHORT}
),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, v.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.qid
                              ORDER BY {d2_exact}, v.vec_id) AS rk
    FROM rcorpus v, q
  ) WHERE rk <= {_RC_TOPK}
),
hits AS (
  SELECT s.np, s.qid, COUNT(*) AS nh
  FROM short s JOIN exact e USING (qid, vec_id) GROUP BY 1, 2
),
grid AS (SELECT a.np, q.qid FROM arms a, q),
perq AS (
  SELECT g.np, g.qid, COALESCE(h.nh, 0) AS nh
  FROM grid g LEFT JOIN hits h ON g.np = h.np AND g.qid = h.qid
),
candn AS (SELECT np, COUNT(*) AS sum_cand FROM cand GROUP BY np)
SELECT CAST(p2.np AS INTEGER) AS nprobe,
       CAST(c2.sum_cand AS BIGINT) AS sum_cand,
       CAST(c2.sum_cand AS DOUBLE)
         / ({float(_RC_NQ)} * (SELECT COUNT(*) FROM documents)) AS cand_frac,
       CAST(SUM(p2.nh) AS BIGINT) AS n_hits,
       CAST(SUM(p2.nh) AS DOUBLE) / {float(_RC_NQ * _RC_TOPK)} AS recall_mean,
       MIN(CAST(p2.nh AS DOUBLE) / {float(_RC_TOPK)}) AS recall_min
FROM perq p2 JOIN candn c2 USING (np)
GROUP BY p2.np, c2.sum_cand
ORDER BY nprobe
"""


def _rc_materialize(sql: str) -> str:
    """DuckDB inlines CTEs by default; this oracle's shared subtrees
    (corpus projection, hier assignment, residual subvectors, the Lloyd
    chain) are each referenced 2-5x and re-expanding the deep tree per
    reference blew planning+execution to ~26 s at sf0.001 (measured).
    Materializing the heavy shared CTEs makes each compute once —
    local to THIS oracle string, the shared builders are untouched."""
    # the Lloyd-round CTE names are DERIVED from _RCROUNDS (ADVICE r11:
    # a hardcoded a1/t1/a2/t2 tuple would silently leave new rounds'
    # CTEs inlined if the round count were ever raised, reintroducing
    # the re-expansion regime this function exists to avoid)
    lloyd = tuple(
        name for r in range(1, _RCROUNDS + 1) for name in (f"a{r}", f"t{r}")
    )
    for cte in ("rcorpus", "hier", "resid", "subs", "cb0", *lloyd, "af", "lut", "cand"):
        sql = sql.replace(f"{cte} AS (", f"{cte} AS MATERIALIZED (", 1)
    return sql


SPECS["ivf_pq_clustered_curve"] = QuerySpec(
    _ivf_pq_clustered_curve,
    _rc_materialize(_ivf_pq_clustered_curve_sql()),
    "IVF-PQ with residual encoding (Jegou et al. IVFADC) on the clustered corpus: recall@10 / candidate-fraction vs nprobe — the composed production serving stack",
)
