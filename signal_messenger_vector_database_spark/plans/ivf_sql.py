"""Shared DuckDB-oracle SQL for the IVF coarse-quantizer family.

ONE definition per engine side (the r8 shared-definition rule): the
Spark side of the two-level quantizer is ``operators/ann.py::
ivf_assign_hier`` + ``hier_super_count``; THIS module is its SQL twin,
imported by every oracle that replays the assignment (ann_ivf_hier,
ivf_hier_quality, knn_graph_ivf, semdedup, ivf_maintenance, the
retrieval-eval pieces).  Geometry/nprobe drift between a query and a
sibling's oracle is structurally impossible because there is exactly
one CTE chain to drift from.

Why hier is the default assignment for every scaled-k consumer (r9):
with the corpus-scaled k ~ n/125 (cluster SIZE bounded so fenced pair
joins stay linear), FLAT assignment costs n*k = n^2/125 cosines — the
next quadratic after the pair joins it fences (wave-11 probe:
ivf_maintenance 0.75/0.74/3.13 s at 1x/4x/16x, the n*k term
surfacing).  Two-level assignment is n*(n_super + nprobe*k/n_super),
minimized at n_super ~ sqrt(k) -> n*(1+nprobe)*sqrt(k); agreement with
flat is measured, not asserted (ivf_hier_quality: 1.0/1.0/0.85 at the
three fixture scales — the sf0.1 point is the only one where
nprobe=3 < n_super, i.e. where the approximation is live).
"""

from __future__ import annotations

# The canonical DuckDB cosine (also aliased as similarity._SQL_COS for
# its historical consumers).  ::DOUBLE[] because the parquet embeddings
# are float32 — both engines must widen BEFORE the fold.
SQL_COS = (
    "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
    "(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
    "sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])))"
)

_COS_ES = SQL_COS.format(a="e.embedding", b="s.sv")
_COS_CS = SQL_COS.format(a="c.cv", b="s.sv")
_COS_VC = SQL_COS.format(a="v.v", b="c2.cv")

# ONE hier-assignment CTE chain shared by every consumer.  Yields
# ``hier`` (vec_id, cid_hier) plus the intermediate p/c/s/c2s/v2s
# tables; consumers append their own CTEs after it.  `p` derives the
# corpus-scaled k (GREATEST(8, n // 125) — operators/ann.py::
# scaled_cluster_count) and the super-cell count ns = GREATEST(2,
# floor(sqrt(k))) (hier_super_count); nprobe=3 is the measured default
# (nprobe 1/2/3/4 -> 0.49/0.68/0.85/1.0 agreement at sf0.1).
# ``src`` parameterizes the corpus relation (a table or an earlier CTE
# with (vec_id, embedding) columns); the module-level constant renders
# the default so every historical consumer's SQL is byte-identical.


def hier_assign_ctes(
    src: str = "embeddings",
    assign_src: str | None = None,
    materialized: bool = False,
) -> str:
    """``src`` is the relation the GEOMETRY and CENTROIDS derive from;
    ``assign_src`` (default: src — rendering byte-identical for every
    historical consumer) is the relation whose vectors get ASSIGNED.
    Passing a different assign_src is the DELTA-maintenance shape
    (VERDICT r11 #2): centroids frozen at the base corpus, only the
    incoming vectors routed — the SQL twin of
    operators/ivf_index.py::shared_hier_assignment_delta.

    ``materialized=True`` pins the expensive ``hier`` CTE with the
    DuckDB MATERIALIZED hint — opt in from any oracle that references
    ``hier`` more than twice (directly or through derived CTEs):
    DuckDB re-evaluates non-materialized CTEs per reference, so the
    n x ns assignment chain multiplies (the curation_pipeline lesson,
    memory'd as an oracle-parity rule).  Default False renders
    byte-identical SQL for every historical consumer."""
    asrc = assign_src or src
    mat = "MATERIALIZED " if materialized else ""
    return f"""p AS (
  SELECT GREATEST(8, COUNT(*) // 125) AS k,
         GREATEST(2, CAST(FLOOR(SQRT(GREATEST(8, COUNT(*) // 125))) AS INTEGER)) AS ns
  FROM {src}
),
c AS (SELECT vec_id AS cid, embedding AS cv FROM {src}, p WHERE vec_id < p.k),
s AS (SELECT cid AS sid, cv AS sv FROM c, p WHERE cid < p.ns),
c2s AS (
  SELECT cid, cv, sid FROM (
    SELECT c.cid, c.cv, s.sid,
           ROW_NUMBER() OVER (PARTITION BY c.cid
                              ORDER BY ({_COS_CS}) DESC, s.sid) AS rk
    FROM c, s
  ) WHERE rk = 1
),
v2s AS (
  SELECT vec_id, v, sid FROM (
    SELECT e.vec_id, e.embedding AS v, s.sid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY ({_COS_ES}) DESC, s.sid) AS rk
    FROM {asrc} e, s
  ) WHERE rk <= 3  -- nprobe=3, the measured default
),
hier AS {mat}(
  SELECT vec_id, cid AS cid_hier FROM (
    SELECT v.vec_id, c2.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY ({_COS_VC}) DESC, c2.cid) AS rk
    FROM v2s v JOIN c2s c2 ON v.sid = c2.sid
  ) WHERE rk = 1
)"""


HIER_ASSIGN_CTES = hier_assign_ctes()


def capped_split_ctes(
    cap: int, src: str = "embeddings", hash_expr: str = "v.vec_id"
) -> str:
    """CTE suffix for the hash-balanced cell split (the DuckDB twin of
    ``operators/ann.py::capped_cell_split`` applied to the shared hier
    assignment): appends after ``HIER_ASSIGN_CTES`` and yields ``sv2``
    (vec_id, embedding, cluster, sub) with sub = 0 for cells at/under
    ``cap`` and an md5-balanced sub in [0, ceil(csz/(cap/2))) above it.
    ONE definition consumed by every capped-fence oracle
    (the semdedup/knn_graph_ivf defaults, semdedup_capped,
    semdedup_uncapped's siblings) — the shared-definition rule.
    ``src`` parameterizes the corpus relation; ``hash_expr`` is what
    the md5 bucket hashes (the twin of capped_cell_split's hash_col —
    pass a group key when co-members must share a sub-cell)."""
    sub_target = max(2, cap // 2)
    hv = " + ".join(
        f"(instr('0123456789abcdef', substr(md5(CAST({hash_expr} AS VARCHAR)), {pos}, 1)) - 1) * {16 ** (4 - pos)}"
        for pos in range(1, 5)
    )
    return f"""v AS (
  SELECT e.vec_id, e.embedding, h.cid_hier AS cluster
  FROM {src} e JOIN hier h USING (vec_id)
),
sz AS (SELECT cluster, COUNT(*) AS csz FROM v GROUP BY cluster),
sv2 AS (
  SELECT v.vec_id, v.embedding, v.cluster,
         CAST(CASE WHEN sz.csz > {cap}
              THEN ({hv}) % CAST(CEIL(sz.csz / {float(sub_target)}) AS BIGINT)
              ELSE 0 END AS INTEGER) AS sub
  FROM v JOIN sz USING (cluster)
)"""
