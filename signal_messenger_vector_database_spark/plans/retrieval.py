"""Lexical + hybrid retrieval: BM25 and reciprocal-rank-fusion.

The reference is a RAG vector store whose retrieval surface is pure
vector similarity (pgvector declared at src/rag/sqlx.rs:22-42).  A
production retrieval stack pairs that with lexical BM25 and fuses the
rankings; both are fully relational here — no UDFs, no cross joins except
broadcasting 1-row corpus statistics.

Scale notes:
- The posting list is filtered to the QUERY'S terms immediately after the
  explode, so df/tf aggregation touches |q| terms' postings, not the
  whole corpus index.
- Corpus stats (N, avgdl) are a 1-row broadcast.
- RRF's row_number windows run over the k-row branch results (k=10), not
  the corpus — a window over a LIMITed set is scale-free.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vector import cosine_similarity
from ..io.sources import load_table
from ..functions.text import portable_round
from .registry import QuerySpec

_QUERY = "customer stream filter"
_K1, _B = 1.2, 0.75
_TOPK = 10
_RRF_K = 60

# same normalization as the dedup shingle pipeline (plans/similarity.py)
_SQL_NORM = "lower(regexp_replace(trim(COALESCE(text, '')), '\\s+', ' ', 'g'))"


def _norm_words(col: str = "text") -> F.Column:
    return F.split(
        F.lower(F.regexp_replace(F.trim(F.coalesce(F.col(col), F.lit(""))), r"\s+", " ")),
        " ",
    )


def _bm25_scores(docs: DataFrame, query_terms: list[str]) -> DataFrame:
    """Per-doc BM25 (Lucene idf variant) for the given query terms."""
    words = docs.select(
        "doc_id", F.explode(_norm_words()).alias("term"), F.size(_norm_words()).alias("dl")
    )
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(_norm_words())).alias("avgdl"),
    )
    qterms = F.array(*[F.lit(t) for t in query_terms])
    posting = words.filter(F.array_contains(qterms, F.col("term")))
    tf = posting.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (
        F.col("tf")
        * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
    )


def _bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = _bm25_scores(docs, _QUERY.split())
    return (
        scored.select("doc_id", portable_round(F.col("score"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_TOPK)
    )


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _QUERY.split())
    core = f"""
words AS (
  SELECT doc_id, unnest(string_split({_SQL_NORM}, ' ')) AS term,
         len(string_split({_SQL_NORM}, ' ')) AS dl
  FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs, AVG(len(string_split({_SQL_NORM}, ' '))) AS avgdl
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
  FROM words WHERE term IN ({terms}) GROUP BY 1, 2
),
docfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
bm25 AS (
  SELECT doc_id,
         SUM(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * tf * ({_K1} + 1)
             / (tf + {_K1} * (1 - {_B} + {_B} * dl / avgdl))) AS score
  FROM tf JOIN docfreq USING (term), stats
  GROUP BY doc_id
)"""
    return core


_BM25_TOPK_SQL = f"""
WITH {_bm25_sql()}
SELECT doc_id, FLOOR(score * 10000 + 0.5) / 10000 AS bm25
FROM bm25
ORDER BY bm25 DESC, doc_id
LIMIT {_TOPK}
"""


def _hybrid_query_vec() -> list[float]:
    from ..operators.embed import HashEmbedder

    return [float(x) for x in HashEmbedder(64).embed_batch([_QUERY])[0]]


def _lex_ranked(docs: DataFrame) -> DataFrame:
    """BM25 arm: top-k + rank — ONE definition shared by hybrid_rrf and
    hybrid_rrf3 (second r8 code review: a rounding/tie-break tweak in a
    copy-pasted arm would silently desync the fusion twins)."""
    return (
        _bm25_scores(docs, _QUERY.split())
        .select("doc_id", portable_round(F.col("score"), 4).alias("s"))
        .orderBy(F.desc("s"), "doc_id")
        .limit(_TOPK)
        .withColumn(
            "lex_rank",
            F.row_number().over(Window.orderBy(F.desc("s"), "doc_id")),
        )
    )


def _sem_ranked(emb: DataFrame) -> DataFrame:
    """Embedding-cosine arm: top-k + rank, shared by both fusions."""
    qv = F.array(*[F.lit(x) for x in _hybrid_query_vec()]).cast("array<double>")
    return (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_similarity(F.col("embedding"), qv), 4).alias("sim"),
        )
        .orderBy(F.desc("sim"), "doc_id")
        .limit(_TOPK)
        .withColumn(
            "sem_rank",
            F.row_number().over(Window.orderBy(F.desc("sim"), "doc_id")),
        )
    )


def _hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 top-k and the cosine top-k:
    score(d) = sum over branches of 1/(RRF_K + rank_branch(d))."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lex = _lex_ranked(docs)
    sem = _sem_ranked(emb)
    fused = (
        lex.select("doc_id", "lex_rank")
        .join(sem.select("doc_id", "sem_rank"), "doc_id", "full_outer")
        .select(
            "doc_id",
            portable_round(
                F.coalesce(1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("sem_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(_TOPK)


def _lex_cte() -> str:
    """SQL twin of _lex_ranked — shared by both fusion oracles."""
    return f"""lex AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY FLOOR(score * 10000 + 0.5) / 10000 DESC, doc_id) AS lex_rank
  FROM bm25
  ORDER BY FLOOR(score * 10000 + 0.5) / 10000 DESC, doc_id
  LIMIT {_TOPK}
)"""


def _sem_cte() -> str:
    """SQL twin of _sem_ranked (expects the q CTE), shared by both
    fusion oracles."""
    return f"""sem AS (
  SELECT vec_id AS doc_id,
         ROW_NUMBER() OVER (ORDER BY ROUND(list_dot_product(e.embedding::DOUBLE[], q.qv) /
               (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                sqrt(list_dot_product(q.qv, q.qv))), 4) DESC, vec_id) AS sem_rank
  FROM embeddings e, q
  ORDER BY ROUND(list_dot_product(e.embedding::DOUBLE[], q.qv) /
               (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                sqrt(list_dot_product(q.qv, q.qv))), 4) DESC, vec_id
  LIMIT {_TOPK}
)"""


def _hybrid_rrf_sql() -> str:
    qv = "[" + ", ".join(repr(x) for x in _hybrid_query_vec()) + "]::DOUBLE[]"
    return f"""
WITH {_bm25_sql()},
{_lex_cte()},
q AS (SELECT {qv} AS qv),
{_sem_cte()}
SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
       FLOOR((COALESCE(1.0 / ({_RRF_K} + lex_rank), 0.0)
            + COALESCE(1.0 / ({_RRF_K} + sem_rank), 0.0)) * 1000000 + 0.5) / 1000000 AS rrf
FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
ORDER BY rrf DESC, doc_id
LIMIT {_TOPK}
"""


SPECS: dict[str, QuerySpec] = {
    "bm25_topk": QuerySpec(
        _bm25_topk,
        _BM25_TOPK_SQL,
        "lexical BM25 top-k (posting filtered to query terms, 1-row stats broadcast)",
    ),
    "hybrid_rrf": QuerySpec(
        _hybrid_rrf,
        _hybrid_rrf_sql(),
        "hybrid retrieval: reciprocal-rank fusion of BM25 and cosine top-k",
    ),
}


def _inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized inverted index — the batch-build artifact behind
    ``bm25_topk``'s on-the-fly stats: per term, document frequency, total
    term frequency, and the first 5 postings.  One explode + one shuffle
    on the term key; ``slice(sort_array(...))`` bounds the per-term
    payload so a hot term cannot blow up a reducer (the full posting list
    would be written as (term, doc) rows instead — noted trade).  Terms
    with df < 10 are dropped, mirroring an index min-df cutoff."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.split(
                F.lower(
                    F.regexp_replace(
                        F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+", " "
                    )
                ),
                " ",
            )
        ).alias("term"),
    )
    per_doc = words.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            # comma-joined string, not array: driver canonicalizer
            # cannot sort array cells (r2 VERDICT issue 2)
            F.array_join(
                F.transform(
                    F.slice(F.sort_array(F.collect_list("doc_id")), 1, 5),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("top_postings"),
        )
        .filter(F.col("df") >= 10)
    )


_INVERTED_INDEX_SQL = """
WITH words AS (
  SELECT doc_id,
         unnest(string_split(lower(regexp_replace(trim(COALESCE(text, '')), '\\s+', ' ', 'g')), ' ')) AS term
  FROM documents
),
per_doc AS (SELECT term, doc_id, COUNT(*) AS tf FROM words GROUP BY term, doc_id)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       array_to_string((list(doc_id ORDER BY doc_id))[1:5], ',') AS top_postings
FROM per_doc
GROUP BY term
HAVING COUNT(*) >= 10
"""


SPECS["inverted_index"] = QuerySpec(
    _inverted_index,
    _INVERTED_INDEX_SQL,
    "inverted-index build: per-term df/tf + bounded posting sample",
)


# --- nDCG@10 ranking-quality evaluation ------------------------------------
# The IR metric a production retrieval stack dashboards next to latency:
# how good is the BM25 ranking, judged by graded relevance?  Ground truth
# here is lexical and deterministic — rel(doc) = number of DISTINCT query
# terms the doc contains (0..|q|) — so both engines derive identical
# integer grades with no model in the loop.  (ann_recall_at_k is the
# vector-side twin; this evaluates the lexical arm of hybrid_rrf.)
#
# Cross-engine FP discipline: the per-rank discount 1/log2(rank+1) is a
# SHARED LITERAL table (computed once in Python, embedded verbatim in both
# texts — log2 is an engine seam, a literal is not), and each rank's
# contribution (2^rel - 1) * discount is quantized to an exact 1e-6
# integer BEFORE summation, so DCG/IDCG are exact BIGINT sums and
# ndcg = dcg/idcg is one deterministic division.  The system ranking is
# orderBy().limit(10) (TakeOrdered — no global single-task window); the
# 10-row result then gets ranks from a scale-free window.

_NDCG_K = 10
_NDCG_DISCOUNTS = [1.0 / math.log2(r + 1) for r in range(1, _NDCG_K + 1)]


def _graded_rel(docs: DataFrame) -> DataFrame:
    """rel(doc) = count of distinct query terms present (docs with rel=0
    are absent; they contribute gain 0 and never rank)."""
    qterms = F.array(*[F.lit(t) for t in _QUERY.split()])
    return (
        docs.select("doc_id", F.explode(_norm_words()).alias("term"))
        .filter(F.array_contains(qterms, F.col("term")))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").cast("int").alias("rel"))
    )


def _ndcg_contrib_q(rel_col: F.Column, rank_col: F.Column) -> F.Column:
    """floor((2^rel - 1) * discount[rank] * 1e6 + 0.5) as exact BIGINT.

    2^rel via pow on small ints (rel <= |q| = 3) is exact in IEEE, so the
    gain doubles are exactly 0/1/3/7 — identical to the oracle's integer
    (1 << rel) - 1 cast to DOUBLE."""
    gain = F.pow(F.lit(2.0), rel_col.cast("double")) - F.lit(1.0)
    disc = F.element_at(
        F.array(*[F.lit(d) for d in _NDCG_DISCOUNTS]), rank_col
    )
    return F.floor(gain * disc * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def _ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rel = _graded_rel(docs)

    scored = _bm25_scores(docs, _QUERY.split()).select(
        "doc_id", portable_round(F.col("score"), 4).alias("bm25")
    )
    sys10 = scored.orderBy(F.desc("bm25"), "doc_id").limit(_NDCG_K)
    wr = Window.orderBy(F.desc("bm25"), "doc_id")
    sys_ranked = (
        sys10.withColumn("rank", F.row_number().over(wr).cast("int"))
        .join(rel, "doc_id", "left")
        .select(
            _ndcg_contrib_q(
                F.coalesce(F.col("rel"), F.lit(0)), F.col("rank")
            ).alias("cq")
        )
    )
    dcg = sys_ranked.agg(F.sum("cq").alias("dcg_q"))

    ideal10 = rel.orderBy(F.desc("rel"), "doc_id").limit(_NDCG_K)
    wi = Window.orderBy(F.desc("rel"), "doc_id")
    ideal_ranked = ideal10.withColumn(
        "rank", F.row_number().over(wi).cast("int")
    ).select(_ndcg_contrib_q(F.col("rel"), F.col("rank")).alias("cq"))
    idcg = ideal_ranked.agg(F.sum("cq").alias("idcg_q"))

    return dcg.crossJoin(idcg).select(
        (F.col("dcg_q").cast("double") / F.col("idcg_q").cast("double")).alias(
            "ndcg10"
        ),
        F.col("dcg_q").cast("long").alias("dcg_q"),
        F.col("idcg_q").cast("long").alias("idcg_q"),
    )


def _ndcg_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _QUERY.split())
    discs = ", ".join(repr(d) for d in _NDCG_DISCOUNTS)
    # contribution template: exact 1e-6-quantized (2^rel - 1) * discount
    def cq(rel: str, rank: str) -> str:
        return (
            f"CAST(FLOOR(CAST((1 << {rel}) - 1 AS DOUBLE)"
            f" * ([{discs}])[{rank}] * 1000000.0 + 0.5) AS BIGINT)"
        )

    return f"""
WITH {_bm25_sql()},
rel AS (
  SELECT doc_id, CAST(COUNT(DISTINCT term) AS INTEGER) AS rel
  FROM words WHERE term IN ({terms}) GROUP BY doc_id
),
sys10 AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY FLOOR(score * 10000 + 0.5) / 10000 DESC, doc_id
           ) AS INTEGER) AS rank
    FROM bm25
  ) WHERE rank <= {_NDCG_K}
),
dcg AS (
  SELECT SUM({cq("COALESCE(r.rel, 0)", "s.rank")}) AS dcg_q
  FROM sys10 s LEFT JOIN rel r ON s.doc_id = r.doc_id
),
ideal10 AS (
  SELECT rel, rank FROM (
    SELECT rel,
           CAST(ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS INTEGER) AS rank
    FROM rel
  ) WHERE rank <= {_NDCG_K}
),
idcg AS (SELECT SUM({cq("rel", "rank")}) AS idcg_q FROM ideal10)
SELECT CAST(dcg_q AS DOUBLE) / CAST(idcg_q AS DOUBLE) AS ndcg10,
       CAST(dcg_q AS BIGINT) AS dcg_q,
       CAST(idcg_q AS BIGINT) AS idcg_q
FROM dcg CROSS JOIN idcg
"""


SPECS["ndcg_eval"] = QuerySpec(
    _ndcg_eval,
    _ndcg_sql(),
    "nDCG@10 of the BM25 ranking vs graded lexical relevance (exact-integer DCG)",
)


# --- tf-idf cosine retrieval (the vector-space model baseline) -------------
# The third lexical scoring mode beside BM25 and the embedding arm: docs
# and the query as sparse tf-idf vectors, ranked by cosine.  idf =
# ln(N/df) over the document frequency of the FULL corpus; the doc norm
# therefore needs every term's tfidf (one vocabulary-keyed df join + one
# doc-keyed aggregate — linear, the inverted_index shape), while the
# numerator only touches the |q| query terms' postings.  The query
# vector has tf=1 per distinct term, so ||q|| = sqrt(sum idf(t)^2) over
# the query terms — computed IN the plan from the same df table (a
# |q|-row broadcast), never a driver-side constant.


def _tfidf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(_norm_words()).alias("term"))
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log(F.col("n_docs") / F.col("df"))
    # per-doc L2 norm over the FULL tf-idf vector
    norms = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(F.sqrt(F.sum(F.pow(F.col("tf") * idf, F.lit(2.0)))).alias("dnorm"))
    )
    qterms = F.array(*[F.lit(t) for t in _QUERY.split()])
    qdf = df_.filter(F.array_contains(qterms, F.col("term")))
    qnorm = (
        qdf.crossJoin(F.broadcast(n_docs))
        .agg(F.sqrt(F.sum(F.pow(idf, F.lit(2.0)))).alias("qnorm"))
    )
    dot = (
        tf.join(F.broadcast(qdf), "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * idf * idf).alias("dot"))
    )
    return (
        dot.join(norms, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "doc_id",
            portable_round(
                F.col("dot") / (F.col("dnorm") * F.col("qnorm")), 4
            ).alias("tfidf_cos"),
        )
        .orderBy(F.desc("tfidf_cos"), "doc_id")
        .limit(_TOPK)
    )


def _tfidf_cosine_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _QUERY.split())
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split({_SQL_NORM}, ' ')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
norms AS (
  SELECT doc_id,
         sqrt(SUM(pow(tf * ln(n_docs / CAST(df AS DOUBLE)), 2.0))) AS dnorm
  FROM tf JOIN df USING (term), nd
  GROUP BY doc_id
),
qdf AS (SELECT term, df FROM df WHERE term IN ({terms})),
qn AS (
  SELECT sqrt(SUM(pow(ln(n_docs / CAST(df AS DOUBLE)), 2.0))) AS qnorm
  FROM qdf, nd
),
dot AS (
  SELECT doc_id,
         SUM(tf * ln(n_docs / CAST(df AS DOUBLE))
                * ln(n_docs / CAST(df AS DOUBLE))) AS dot
  FROM tf JOIN qdf USING (term), nd
  GROUP BY doc_id
)
SELECT d.doc_id,
       FLOOR(d.dot / (n.dnorm * q.qnorm) * 10000 + 0.5) / 10000 AS tfidf_cos
FROM dot d JOIN norms n USING (doc_id), qn q
ORDER BY tfidf_cos DESC, d.doc_id
LIMIT {_TOPK}
"""


SPECS["tfidf_cosine_topk"] = QuerySpec(
    _tfidf_cosine_topk,
    _tfidf_cosine_sql(),
    "vector-space retrieval: sparse tf-idf cosine top-k (full-corpus norms, query-term postings)",
)


# --- 3-way hybrid fusion --------------------------------------------------
# hybrid_rrf fuses two rankings; production stacks fuse all available
# scorers.  Same RRF arithmetic over three arms (BM25, tf-idf cosine,
# embedding cosine); each arm is its own LIMITed top-k so every rank
# window is scale-free, and the fusion join touches <= 3k rows.


def _hybrid_rrf3(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lex = _lex_ranked(docs)
    vs = (
        _tfidf_cosine_topk(spark, sf_dir)
        .withColumn(
            "vs_rank",
            F.row_number().over(
                Window.orderBy(F.desc("tfidf_cos"), "doc_id")
            ),
        )
    )
    sem = _sem_ranked(emb)
    fused = (
        lex.select("doc_id", "lex_rank")
        .join(vs.select("doc_id", "vs_rank"), "doc_id", "full_outer")
        .join(sem.select("doc_id", "sem_rank"), "doc_id", "full_outer")
        .select(
            "doc_id",
            portable_round(
                F.coalesce(1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("vs_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("sem_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(_TOPK)


def _hybrid_rrf3_sql() -> str:
    qv = "[" + ", ".join(repr(x) for x in _hybrid_query_vec()) + "]::DOUBLE[]"
    return f"""
WITH {_bm25_sql()},
{_lex_cte()},
vs AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY tfidf_cos DESC, doc_id) AS vs_rank
  FROM ({_tfidf_cosine_sql()})
),
q AS (SELECT {qv} AS qv),
{_sem_cte()}
SELECT doc_id,
       FLOOR((COALESCE(1.0 / ({_RRF_K} + lex_rank), 0.0)
            + COALESCE(1.0 / ({_RRF_K} + vs_rank), 0.0)
            + COALESCE(1.0 / ({_RRF_K} + sem_rank), 0.0)) * 1000000 + 0.5) / 1000000 AS rrf
FROM lex
FULL OUTER JOIN vs USING (doc_id)
FULL OUTER JOIN sem USING (doc_id)
ORDER BY rrf DESC, doc_id
LIMIT {_TOPK}
"""


SPECS["hybrid_rrf3"] = QuerySpec(
    _hybrid_rrf3,
    _hybrid_rrf3_sql(),
    "3-way reciprocal-rank fusion: BM25 + tf-idf cosine + embedding cosine",
)
