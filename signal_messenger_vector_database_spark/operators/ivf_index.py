"""Build-once shared IVF assignment (VERDICT r10 #3).

The x64 probe showed the two-level coarse assignment's n*(1+nprobe)*
sqrt(k) term as the dominant superlinear cost of the whole IVF family —
and SEVEN catalog consumers (semdedup, knn_graph_ivf, ivf_maintenance,
ann_recall_at_k, hard_negative_mining, both bitext queries) each
recompute the IDENTICAL assignment over the same corpus.  At 100 TB
the assignment must be a materialized index build amortized across
consumers, not a per-query recompute: build once, write (vec_id, cid)
to parquet keyed by the corpus, and let every consumer equi-join
against the stored index — per-query marginal cost linear in n.

Design:

* **Opt-in by environment** (``SMVD_IVF_CACHE_DIR``): when unset —
  the driver's oracle runs, tests, bench — every consumer uses the
  inline ``ivf_assign_hier`` path unchanged, so plan construction
  never runs a job (the repo rule) and every oracle string is
  untouched.  When set (the scaling probe, a production deployment's
  index-build step), the first consumer materializes the assignment
  and later consumers read it.
* **Corpus-keyed** (the ``tokenize_cl100k`` snapshot pattern): the
  cache key hashes the caller's corpus token (source path + row
  count) together with the full assignment geometry (k, n_super,
  nprobe) — a corpus or geometry change can never read a stale index,
  it simply misses to a fresh build.
* **Bit-identical by construction**: the cached frame is the parquet
  round-trip of the very DataFrame the inline path returns; (long,
  long) columns round-trip exactly, so consumers' results — and their
  DuckDB oracles — are unchanged either way (pinned by
  test_ivf_index).

Reference parity note: the reference installs pgvectorscale
(src/rag/sqlx.rs:22-29) whose DiskANN index IS a persisted build-once
structure — it just never builds one.  This operator is that missing
build step, Spark-shaped.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from .ann import ivf_assign_hier


def ivf_cache_dir() -> str | None:
    """The shared-index cache root, or None (inline path) when the
    deployment has not opted in."""
    return os.environ.get("SMVD_IVF_CACHE_DIR") or None


def shared_hier_assignment(
    spark: SparkSession,
    emb: DataFrame,
    corpus_token: str,
    k: int,
    n_super: int,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shard_threshold: int = 4096,
) -> DataFrame:
    """The two-level coarse assignment, amortized: returns the same
    (id_col, cid) frame as ``ivf_assign_hier`` — from the corpus-keyed
    parquet index when ``SMVD_IVF_CACHE_DIR`` is set (building it on
    first use), inline otherwise.

    ``corpus_token`` must identify the corpus bytes the caller scans
    (e.g. ``f"{sf_dir}/embeddings|{n}"``); derived corpora pass their
    derivation tag so two different projections of the same table
    never share an index.

    Write discipline: the build is re-run whenever ``_SUCCESS`` is
    absent (a crashed partial write self-heals via mode=overwrite).
    Concurrent builders of the SAME key are out of scope — the cache
    is per-driver (one session's queries run sequentially); a
    multi-tenant deployment would front this with an atomic-rename or
    catalog-level lock, which parquet-on-object-store makes cheap."""

    def inline() -> DataFrame:
        return ivf_assign_hier(
            emb,
            _seed(emb, k, id_col, vec_col),
            n_super,
            nprobe=nprobe,
            id_col=id_col,
            vec_col=vec_col,
            n_centroids=k,
            shard_threshold=shard_threshold,
        )

    cache = ivf_cache_dir()
    if cache is None:
        return inline()
    key = hashlib.md5(
        f"{corpus_token}|k={k}|ns={n_super}|np={nprobe}".encode()
    ).hexdigest()[:20]
    path = os.path.join(cache, f"hier_{key}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        inline().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).select(id_col, "cid")


def _seed(emb: DataFrame, k: int, id_col: str, vec_col: str) -> DataFrame:
    from .ann import ivf_seed_centroids

    return ivf_seed_centroids(emb, k, id_col=id_col, vec_col=vec_col)


def shared_pq_parts(
    spark: SparkSession,
    subs: DataFrame,
    corpus_token: str,
    d: int,
    k: int,
    rounds: int,
) -> tuple[DataFrame, DataFrame]:
    """Trained-PQ parts (final assignment + codebooks), amortized the
    same way as the coarse assignment: the three trained-PQ catalog
    queries each retrain IDENTICAL codebooks over the same corpus
    (~10 s each at sf0.1 — the pq_train_inplace Lloyd rounds), and the
    residual curve trains its own set.  With ``SMVD_IVF_CACHE_DIR``
    set, the (sub_j, code, cw) codebooks and the (vec_id, sub_j, code)
    final assignment are parquet-materialized once per (corpus token,
    geometry); inline otherwise — byte-identical either way (ints and
    1e-4-grid doubles round-trip parquet exactly; pinned by
    test_ivf_index).  Same write discipline as the assignment cache."""
    from ..plans.pq_trained import pq_train_inplace

    cache = ivf_cache_dir()
    if cache is None:
        return pq_train_inplace(subs, d, k, rounds)
    key = hashlib.md5(
        f"{corpus_token}|pq|d={d}|k={k}|r={rounds}".encode()
    ).hexdigest()[:20]
    af_path = os.path.join(cache, f"pq_af_{key}")
    cb_path = os.path.join(cache, f"pq_cb_{key}")
    if not (
        os.path.exists(os.path.join(af_path, "_SUCCESS"))
        and os.path.exists(os.path.join(cb_path, "_SUCCESS"))
    ):
        af, cb = pq_train_inplace(subs, d, k, rounds)
        af.write.mode("overwrite").parquet(af_path)
        cb.write.mode("overwrite").parquet(cb_path)
    return (
        spark.read.parquet(af_path).select("vec_id", "sub_j", "code"),
        spark.read.parquet(cb_path).select("sub_j", "code", "cw"),
    )
