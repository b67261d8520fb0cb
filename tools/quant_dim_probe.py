"""Dimension-realism probe for the quantizer operating points
(VERDICT r14 #4).

``quant_recall_matrix`` measures SQ8 / binary / routed-binary recall on
the 64-d fixtures — the WORST case for 64-bit sign codes, and not the
reference's geometry: its declared embedding column is ``VECTOR(768)``
(``src/rag/sqlx.rs:42``, nomic-embed-text).  This tool generates local
synthetic corpora at BOTH dimensions and measures each quantizer's
recall@10 and the binary shortlist width needed for full top-10
coverage — converting the ``_BINARY_RERANK_SHORTLIST`` code comment
("production dims shrink this") from assertion to measurement.

Methodology
-----------
Pure NumPy, deliberately: the quantizer arithmetic (per-vector
symmetric int8, sign-bit Hamming, PQ/ADC) is engine-independent math,
and the ENGINE path for all three is already oracle-proven bit-exact
at 64-d by the paired catalog queries (topk_ivf_sq8,
topk_binary_rerank / topk_ivf_binary, topk_ivf_pq_trained,
quant_recall_matrix).  What is NOT yet measured is the operating point
at the reference's production dimension — a property of the geometry,
not of the execution engine.  Schemes mirror the engine exactly:

  sq8     code_i = floor(x_i / (max|x|/127) + 0.5)   (plans/vectorops.py
          ``_quantized``; per-vector scale cancels out of cosine)
  binary  sign bits over ALL dims, Hamming distance (``_pack_sign_bits``
          generalized past 64 bits)
  pq      dims/8 subspaces x 16 codewords, ONE Lloyd round from
          data-seeded init, symmetric-quantized ADC ranking (the
          ``pq_encode_trained`` recipe)

Corpora: unit-norm mixtures of Gaussians, two cluster strengths —
``fixture-like`` tuned to the testdata geometry (within-label centroid
norm ~0.15, nearly isotropic: the hard case) and ``clustered``
(centroid norm ~0.5: the geometry real text-embedding corpora show,
where neighbors are semantically tight).  Queries are perturbed corpus
points (the realistic ANN workload: the answer exists).

Usage:
    python tools/quant_dim_probe.py [--n=20000] [--queries=50]
Prints one JSON line per (dim, variant) and a summary line; record the
output as a SCALING.md wave.
"""

from __future__ import annotations

import json
import sys

import numpy as np

K = 10  # recall@K
BINARY_WIDTHS = (16, 32, 64, 128, 256, 512, 1024)
PQ_SHORTLIST = 100
SQ8_SHORTLIST = 64


def make_corpus(
    rng: np.random.Generator,
    n: int,
    dim: int,
    n_centers: int,
    center_scale: float,
) -> np.ndarray:
    centers = rng.standard_normal((n_centers, dim)) * center_scale
    labels = rng.integers(0, n_centers, size=n)
    x = centers[labels] + rng.standard_normal((n, dim))
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def make_queries(
    rng: np.random.Generator, corpus: np.ndarray, n_q: int
) -> np.ndarray:
    """Perturbed corpus points with a DIMENSION-FREE target cosine: the
    noise is a unit vector scaled by 0.3, so cos(q, x) ~ 1/sqrt(1.09)
    ~ 0.96 at every dim (a raw N(0, I) perturbation has norm
    sqrt(dim) and would decorrelate high-dim queries from their
    targets, comparing dims on different workloads)."""
    idx = rng.choice(len(corpus), size=n_q, replace=False)
    z = rng.standard_normal((n_q, corpus.shape[1]))
    u = z / np.linalg.norm(z, axis=1, keepdims=True)
    q = corpus[idx] + 0.3 * u
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def exact_topk(corpus: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    sims = queries @ corpus.T  # unit-norm: dot == cosine
    return np.argsort(-sims, axis=1, kind="stable")[:, :k]


def recall_of_ranking(order: np.ndarray, truth: np.ndarray, k: int) -> float:
    hits = [
        len(set(order[i, :k]) & set(truth[i])) for i in range(len(truth))
    ]
    return float(np.mean(hits) / truth.shape[1])


def coverage_at(order: np.ndarray, truth: np.ndarray, width: int) -> float:
    """Mean fraction of the exact top-10 inside the approx shortlist of
    ``width`` — what survives into an exact re-rank of that width."""
    cov = [
        len(set(order[i, :width]) & set(truth[i])) for i in range(len(truth))
    ]
    return float(np.mean(cov) / truth.shape[1])


def sq8_ranking(corpus: np.ndarray, queries: np.ndarray) -> np.ndarray:
    def codes(x):
        scale = np.maximum(np.abs(x).max(axis=1, keepdims=True) / 127.0, 1e-12)
        return np.floor(x / scale + 0.5)

    c, q = codes(corpus), codes(queries)
    cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return np.argsort(-(qn @ cn.T), axis=1, kind="stable")


def binary_ranking(corpus: np.ndarray, queries: np.ndarray) -> np.ndarray:
    cb = corpus > 0
    qb = queries > 0
    # Hamming = popcount(xor) — computed dim-wise on the bool matrix
    ham = (qb[:, None, :] ^ cb[None, :, :]).sum(axis=2)
    return np.argsort(ham, axis=1, kind="stable")


def hier_route(
    corpus: np.ndarray, queries: np.ndarray, n_cells: int = 2, nprobe: int = 3
) -> tuple[np.ndarray, list[np.ndarray]]:
    """NumPy port of the engine's two-level IVF rule
    (operators/ann.py::ivf_assign_hier / route_query_cells, the
    plans/ivf_sql.py CTE twin): seeded centroids = first k vectors,
    supers = first ns, k = max(8, n//125), ns = max(2, floor(sqrt k));
    every argmax tie-breaks to the LOWEST id (argsort stable on the
    negated scores), matching ORDER BY cos DESC, id.  Returns the
    per-vector cell assignment and each query's n_cells routed cells."""
    n = len(corpus)
    k = max(8, n // 125)
    ns = max(2, int(np.sqrt(k)))
    cents, sups = corpus[:k], corpus[:ns]
    c2s = np.argmax(cents @ sups.T, axis=1)
    top_sup = np.argsort(-(corpus @ sups.T), axis=1, kind="stable")[:, :nprobe]
    vc = corpus @ cents.T
    assign = np.empty(n, dtype=np.int64)
    for i in range(n):
        cids = np.nonzero(np.isin(c2s, top_sup[i]))[0]
        assign[i] = cids[np.argmax(vc[i, cids])]
    q_sup = np.argsort(-(queries @ sups.T), axis=1, kind="stable")[:, :nprobe]
    qc = queries @ cents.T
    routed = []
    for j in range(len(queries)):
        cids = np.nonzero(np.isin(c2s, q_sup[j]))[0]
        order = cids[np.argsort(-qc[j, cids], kind="stable")]
        routed.append(order[:n_cells])
    return assign, routed


def routed_metrics(
    corpus: np.ndarray,
    queries: np.ndarray,
    truth: np.ndarray,
    t1: int = 64,
    t2: int = 20,
) -> dict:
    """The serving forms at this dimension: routed-binary recall@10
    (topk_ivf_binary's shape) and the three-tier cascade recall@5
    (topk_ivf_cascade: route -> Hamming keeps t1 -> int8 cosine keeps
    t2 -> exact keeps 5), plus the routed candidate fraction."""
    assign, routed = hier_route(corpus, queries)
    cb = corpus > 0

    def sq8(x):
        scale = np.maximum(np.abs(x).max(axis=1, keepdims=True) / 127.0, 1e-12)
        c = np.floor(x / scale + 0.5)
        return c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)

    csq = sq8(corpus)
    exact5 = truth[:, :5]
    r10_hits, r5_hits, frac, ceil_hits = [], [], [], []
    for j, q in enumerate(queries):
        cand = np.nonzero(np.isin(assign, routed[j]))[0]
        frac.append(len(cand) / len(corpus))
        # the router's own ceiling: exact cosine within the routed set —
        # what any scorer could at best recover; cascade loss below this
        # is the quantizers', loss at this line is the router's
        ceil_hits.append(
            len(set(cand) & set(truth[j])) / truth.shape[1]
        )
        qb = q > 0
        ham = (cb[cand] ^ qb).sum(axis=1)
        order = cand[np.argsort(ham, kind="stable")]
        r10_hits.append(len(set(order[:10]) & set(truth[j])) / truth.shape[1])
        keep1 = order[:t1]
        qs = sq8(q[None, :])[0]
        keep2 = keep1[
            np.argsort(-(csq[keep1] @ qs), kind="stable")[:t2]
        ]
        final5 = keep2[np.argsort(-(corpus[keep2] @ q), kind="stable")[:5]]
        r5_hits.append(len(set(final5) & set(exact5[j])) / 5.0)
    return {
        "routed_candidate_frac": round(float(np.mean(frac)), 4),
        "router_ceiling_recall@10": round(float(np.mean(ceil_hits)), 3),
        "binary_routed_recall@10": round(float(np.mean(r10_hits)), 3),
        "cascade_recall@5": round(float(np.mean(r5_hits)), 3),
    }


def pq_ranking(
    rng: np.random.Generator, corpus: np.ndarray, queries: np.ndarray
) -> np.ndarray:
    n, dim = corpus.shape
    d = 8
    m = dim // d
    sub = corpus.reshape(n, m, d)
    order = np.empty((len(queries), n))
    adc = np.zeros((len(queries), n))
    for j in range(m):
        x = sub[:, j, :]
        books = x[rng.choice(n, size=16, replace=False)]  # data-seeded init
        # ONE Lloyd round (the pq_encode_trained recipe)
        d2 = ((x[:, None, :] - books[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(16):
            mask = assign == c
            if mask.any():
                books[c] = x[mask].mean(axis=0)
        d2 = ((x[:, None, :] - books[None, :, :]) ** 2).sum(axis=2)
        codes = d2.argmin(axis=1)
        qsub = queries.reshape(len(queries), m, d)[:, j, :]
        lut = ((qsub[:, None, :] - books[None, :, :]) ** 2).sum(axis=2)
        adc += lut[:, codes]
    return np.argsort(adc, axis=1, kind="stable")


def main() -> None:
    n, n_q = 20000, 50
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        elif a.startswith("--queries="):
            n_q = int(a.split("=", 1)[1])
        else:
            sys.exit(f"unrecognized argument {a!r}")

    summary = {}
    for dim in (64, 768):
        for variant, center_scale in (
            # tuned so within-label centroid norm lands ~0.15 / ~0.5 on
            # unit-norm output (center||noise mixing is dim-free)
            ("fixture-like", 0.15),
            ("clustered", 0.6),
        ):
            rng = np.random.default_rng(20260816)
            corpus = make_corpus(rng, n, dim, n_centers=32, center_scale=center_scale)
            queries = make_queries(rng, corpus, n_q)
            truth = exact_topk(corpus, queries, K)

            row = {"dim": dim, "variant": variant, "n": n, "n_queries": n_q}
            sq8 = sq8_ranking(corpus, queries)
            row["sq8_recall@10"] = round(recall_of_ranking(sq8, truth, K), 3)
            row[f"sq8_coverage@{SQ8_SHORTLIST}"] = round(
                coverage_at(sq8, truth, SQ8_SHORTLIST), 3
            )

            b = binary_ranking(corpus, queries)
            row["binary_recall@10"] = round(recall_of_ranking(b, truth, K), 3)
            for w in BINARY_WIDTHS:
                row[f"binary_coverage@{w}"] = round(coverage_at(b, truth, w), 3)
            full = [
                w for w in BINARY_WIDTHS if coverage_at(b, truth, w) >= 0.999
            ]
            row["binary_full_recall_width"] = full[0] if full else None

            pq = pq_ranking(rng, corpus, queries)
            row["pq_recall@10"] = round(recall_of_ranking(pq, truth, K), 3)
            row[f"pq_coverage@{PQ_SHORTLIST}"] = round(
                coverage_at(pq, truth, PQ_SHORTLIST), 3
            )
            row.update(routed_metrics(corpus, queries, truth))
            print(json.dumps(row), flush=True)
            summary[f"d{dim}/{variant}"] = {
                "binary_r10": row["binary_recall@10"],
                "binary_full_width": row["binary_full_recall_width"],
                "sq8_r10": row["sq8_recall@10"],
                "pq_r10": row["pq_recall@10"],
                "routed_frac": row["routed_candidate_frac"],
                "binary_routed_r10": row["binary_routed_recall@10"],
                "cascade_r5": row["cascade_recall@5"],
            }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
