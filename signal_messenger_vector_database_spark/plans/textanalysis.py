"""Text-analysis query surface (north-star training-data operators):
language ID, quality scoring, rolling-hash fingerprints, corpus stats.
All oracle-paired — these are pure expression pipelines on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from ..operators.textanalysis import (
    LANG_MARKERS,
    ROLLING_HASH_BASE,
    ROLLING_HASH_MOD,
    language_id,
    quality_features,
    rolling_hash,
    word_frequencies,
)
from ..functions.text import portable_round
from .registry import QuerySpec

_SQL_WORDS_LOWER = (
    "CASE WHEN trim(COALESCE({c}, '')) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(trim(lower({c})), '\\s+') END"
)


# --- language ID ---------------------------------------------------------
def _lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", language_id("text").alias("predicted_lang")
    )


def _lang_id_sql() -> str:
    words = _SQL_WORDS_LOWER.format(c="text")
    hits = {
        lang: f"len(list_filter({words}, w -> w IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    arms = []
    for lang in langs:
        conds = [f"{hits[lang]} > 0"]
        for other in langs:
            if other == lang:
                continue
            op = ">" if langs.index(other) < langs.index(lang) else ">="
            conds.append(f"{hits[lang]} {op} {hits[other]}")
        arms.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(arms) + " ELSE 'und' END"
    return f"SELECT doc_id, lang, {case} AS predicted_lang FROM documents"


# --- quality scoring -----------------------------------------------------
def _quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features("text")
    return docs.select(
        "doc_id", *[c.alias(name) for name, c in feats.items()]
    )


def _quality_sql() -> str:
    c = "COALESCE(text, '')"
    words = (
        "CASE WHEN trim(COALESCE(text, '')) = '' THEN CAST([] AS VARCHAR[]) "
        "ELSE regexp_split_to_array(trim(text), '\\s+') END"
    )
    stops = ", ".join(repr(m) for m in LANG_MARKERS["en"])
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({words}) AS INTEGER) AS n_words,
         CAST(length({c}) AS INTEGER) AS n_chars,
         len(regexp_extract_all({c}, '[^A-Za-z0-9_\\s]')) AS punct,
         len(regexp_extract_all({c}, '[0-9]')) AS digits,
         len(list_filter({words}, w -> lower(w) IN ({stops}))) AS stop
  FROM documents
)
SELECT doc_id, n_words, n_chars,
       floor(((n_chars - (n_words - 1)) / CAST(greatest(n_words, 1) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS mean_word_len,
       floor((punct / CAST(greatest(n_chars, 1) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
       floor((digits / CAST(greatest(n_chars, 1) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS digit_ratio,
       floor((stop / CAST(greatest(n_words, 1) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
       floor((0.4 * least(n_words / 50.0, 1.0)
           + 0.3 * (1 - least(punct / CAST(greatest(n_chars, 1) AS DOUBLE) * 5, 1.0))
           + 0.3 * least(stop / CAST(greatest(n_words, 1) AS DOUBLE) * 5, 1.0)) * 10000.0 + 0.5) / 10000.0 AS quality_score
FROM t
"""


# --- rolling-hash fingerprint -------------------------------------------
def _rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_hash("text").alias("fingerprint"))


_ROLLING_FINGERPRINT_SQL = f"""
SELECT doc_id,
       CAST(CASE WHEN length(COALESCE(text, '')) = 0 THEN 0
            ELSE list_reduce(
                   list_prepend(CAST(0 AS BIGINT), list_transform(
                       generate_series(1, length(text)),
                       i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
                   (acc, x) -> (acc * {ROLLING_HASH_BASE} + x) % {ROLLING_HASH_MOD})
       END AS BIGINT) AS fingerprint
FROM documents
"""


# --- corpus word frequencies (top 25) ------------------------------------
def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        word_frequencies(docs, "text")
        .orderBy(F.desc("freq"), "word")
        .limit(25)
    )


_WORD_FREQ_SQL = f"""
SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
FROM (SELECT unnest({_SQL_WORDS_LOWER.format(c="text")}) AS word FROM documents)
GROUP BY word ORDER BY freq DESC, word LIMIT 25
"""


# --- per-source token stats ---------------------------------------------
def _source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("tokens", token_count("text"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("tokens"), 4).alias("avg_tokens"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


_SOURCE_STATS_SQL = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 0
                ELSE len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) END) AS BIGINT) AS total_tokens,
       ROUND(AVG(CASE WHEN text IS NULL OR text = '' THEN 0
                 ELSE len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) END), 4) AS avg_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM documents GROUP BY source
"""


# --- character-entropy quality signal -----------------------------------
# Shannon entropy of the character distribution: near-zero for repetitive
# junk ("aaaa..."), high for natural text — a standard cheap quality
# filter alongside the ratio features.  Pure relational: explode chars,
# two-key count, per-doc fold.  Both engines sum the same -p*ln(p) terms;
# portable_round absorbs ulp-level summation-order drift.
def _char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.length("ch") == 1)
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tot = counts.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    from ..functions.text import portable_round

    return (
        counts.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            portable_round(-F.sum(p * F.log(p)), 4).alias("entropy"),
            F.countDistinct("ch").alias("alphabet"),
        )
    )


_CHAR_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
counts AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS DOUBLE) AS c
  FROM chars WHERE len(ch) = 1 GROUP BY 1, 2
),
tot AS (SELECT doc_id, SUM(c) AS n FROM counts GROUP BY 1)
SELECT doc_id,
       FLOOR((-SUM((c / n) * ln(c / n))) * 10000 + 0.5) / 10000 AS entropy,
       CAST(COUNT(DISTINCT ch) AS BIGINT) AS alphabet
FROM counts JOIN tot USING (doc_id)
GROUP BY doc_id
"""


SPECS: dict[str, QuerySpec] = {
    "char_entropy": QuerySpec(
        _char_entropy,
        _CHAR_ENTROPY_SQL,
        "Shannon character entropy + alphabet size per document",
    ),
    "lang_id": QuerySpec(_lang_id, _lang_id_sql(), "marker-stopword language heuristic"),
    "quality_score": QuerySpec(_quality, _quality_sql(), "doc quality features + composite score"),
    "rolling_fingerprint": QuerySpec(_rolling_fingerprint, _ROLLING_FINGERPRINT_SQL, "polynomial rolling-hash fingerprint"),
    "word_freq": QuerySpec(_word_freq, _WORD_FREQ_SQL, "corpus word frequency top-25"),
    "source_stats": QuerySpec(_source_stats, _SOURCE_STATS_SQL, "per-source token stats"),
}


# --- T1 cl100k parity path (VERDICT r1 task 4) ---------------------------
# The reference counts cl100k_base BPE tokens (src/rag/dataframes.rs:32-39).
# functions/bpe.py implements the same algorithm (public cl100k split regex
# + lowest-rank byte-pair merge over a .tiktoken ranks table); with a real
# cl100k_base.tiktoken on $SMVD_TIKTOKEN_FILE the counts are exactly the
# reference's, offline the vendored mini vocabulary substitutes.  The
# oracle is a checked-in snapshot precomputed by the PURE-PYTHON encoder
# (tools/gen_cl100k_oracle.py, no Spark involved), so the compare proves
# the distributed pandas-UDF path reproduces the sequential reference
# implementation at sf0.01.


def _tokenize_cl100k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.bpe import MINI_BPE_PATH, bpe_token_count_column

    docs = load_table(spark, sf_dir, "documents")
    # The CATALOG entry pins the vendored mini vocabulary explicitly: its
    # oracle is a snapshot precomputed from that exact vocab, so letting
    # $SMVD_TIKTOKEN_FILE retarget the UDF (but not the snapshot) would
    # produce spurious mismatches (r2 ADVICE item 5).  The env-var seam
    # stays the production path; env-gated tests exercise it.
    return docs.select(
        "doc_id",
        bpe_token_count_column(F.col("text"), ranks_path=MINI_BPE_PATH).alias(
            "n_tokens"
        ),
    )


def _tokenize_cl100k_sql() -> str:
    """Embed ALL fixture snapshots, keyed by the corpus's total
    character mass (sum(n_chars); the doc COUNT is 500
    at both small fixtures, so it cannot discriminate), and let
    the oracle select the one matching the corpus it actually reads.
    Before this, the oracle was hard-pinned to the sf0.01 snapshot and
    was wrong by construction at every other scale (found by the full
    sf0.001 oracle sweep).

    The corpus key is read from each snapshot's ``# corpus_key=`` header
    (baked in by tools/gen_cl100k_oracle.py, which already reads the
    corpus) — building this SQL does NO fixture I/O, so importing the
    plans catalog works on machines without the fixtures and pays no
    parquet scans (ADVICE r7 medium)."""
    import os

    from ..functions.bpe import _DATA_DIR

    values = []
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = os.path.join(_DATA_DIR, f"tokenize_cl100k_{sf}.tsv")
        with open(path) as f:
            header = f.readline().strip()
            if not header.startswith("# corpus_key="):
                raise ValueError(
                    f"{path}: missing '# corpus_key=' header — regenerate "
                    "with tools/gen_cl100k_oracle.py"
                )
            key = int(header.split("=", 1)[1])
            rows = [line.split() for line in f if line.strip()]
        values.extend(f"({key}, {d}, {n})" for d, n in rows)
    joined = ", ".join(values)
    return (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_tokens AS INTEGER) AS n_tokens "
        f"FROM (VALUES {joined}) AS t(corpus_key, doc_id, n_tokens) "
        "WHERE corpus_key = (SELECT SUM(n_chars) FROM documents)"
    )


SPECS["tokenize_cl100k"] = QuerySpec(
    _tokenize_cl100k,
    _tokenize_cl100k_sql(),
    "cl100k-algorithm BPE token count (pandas UDF vs precomputed pure-Python snapshot)",
)


# --- bigram LM log-prob (perplexity-proxy quality filter) ----------------
# CCNet-style filtering ranks documents by language-model perplexity; the
# relational version is an add-one-smoothed bigram LM trained on the
# corpus itself: P(w|v) = (C(v,w)+1)/(C(v)+V).  Everything is counts +
# joins — the bigram/unigram tables are corpus-global aggregates (the
# "training"), the per-doc score is an equi-join back onto them; at scale
# both count tables partial-aggregate and the joins broadcast (vocab) or
# shuffle on the bigram key.  exp(-avg log P) = the doc's perplexity.


def _bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.posexplode(
            F.split(
                F.lower(
                    F.regexp_replace(
                        F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+", " "
                    )
                ),
                " ",
            )
        ).alias("pos", "w"),
    )
    from pyspark.sql.window import Window

    wn = Window.partitionBy("doc_id").orderBy("pos")
    # persisted: the bigram table feeds the count build AND the final
    # score join — without it the explode+window re-runs per consumer
    bigrams = (
        words.withColumn("v", F.lag("w").over(wn))
        .filter(F.col("v").isNotNull())
        .select("doc_id", "v", "w")
    ).persist()
    c_pair = bigrams.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    # C(v) = sum over w of C(v,w): derived from the pair table, not a
    # third pass over the corpus
    c_prev = c_pair.groupBy("v").agg(F.sum("c_vw").alias("c_v"))
    vocab = words.agg(F.count_distinct("w").alias("vsize"))
    logp = F.log(
        (F.col("c_vw") + 1) / (F.col("c_v") + F.col("vsize"))
    )
    return (
        bigrams.join(c_pair, ["v", "w"])
        .join(F.broadcast(c_prev), "v")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            portable_round(F.avg(logp), 4).alias("avg_logprob"),
        )
    )


_BIGRAM_LOGPROB_SQL = f"""
WITH words AS (
  SELECT doc_id, u.i AS pos, u.w FROM (
    SELECT doc_id,
           unnest(list_transform(
                  string_split(lower(regexp_replace(trim(COALESCE(text, '')), '\\s+', ' ', 'g')), ' '),
                  (x, i) -> struct_pack(i := i, w := x))) AS u
    FROM documents
  )
),
bigrams AS (
  SELECT doc_id, LAG(w) OVER (PARTITION BY doc_id ORDER BY pos) AS v, w
  FROM words QUALIFY v IS NOT NULL
),
c_pair AS (SELECT v, w, COUNT(*) AS c_vw FROM bigrams GROUP BY v, w),
c_prev AS (SELECT v, COUNT(*) AS c_v FROM bigrams GROUP BY v),
vocab AS (SELECT COUNT(DISTINCT w) AS vsize FROM words)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       FLOOR(AVG(ln((c_vw + 1) * 1.0 / (c_v + vsize))) * 10000 + 0.5) / 10000 AS avg_logprob
FROM bigrams JOIN c_pair USING (v, w) JOIN c_prev USING (v), vocab
GROUP BY doc_id
"""

SPECS["bigram_logprob"] = QuerySpec(
    _bigram_logprob,
    _BIGRAM_LOGPROB_SQL,
    "add-one-smoothed bigram LM avg log-prob per doc (perplexity-proxy quality)",
)


def _collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations (adjacent word pairs) by pointwise mutual
    information — a standard corpus-analysis pass for phrase mining and
    tokenizer-vocab construction.

    PMI margins are taken over the bigram table itself (c_x = count of x
    as bigram-left, c_y = count of y as bigram-right, N = bigram count):
    self-consistent, edge-effect-free, and every input to ``ln`` is an
    exact integer ratio so both engines compute identical doubles.  The
    whole query is explode -> per-doc lag -> three relational aggregates;
    the margins are tiny (vocab-sized) and broadcast back onto the pair
    table, so the corpus shuffles once, on the bigram key.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.posexplode(
            F.split(
                F.lower(
                    F.regexp_replace(
                        F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+", " "
                    )
                ),
                " ",
            )
        ).alias("pos", "w"),
    )
    wn = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        words.withColumn("v", F.lag("w").over(wn))
        .filter(F.col("v").isNotNull())
        .select("v", "w")
    ).persist()
    c_pair = bigrams.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    c_left = bigrams.groupBy("v").agg(F.count(F.lit(1)).alias("c_v"))
    c_right = bigrams.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    n_total = bigrams.agg(F.count(F.lit(1)).alias("n_bigrams"))
    pmi = F.log(
        (F.col("c_vw") * F.col("n_bigrams"))
        / (F.col("c_v") * F.col("c_w"))
    )
    from ..functions.text import portable_round

    return (
        c_pair.filter(F.col("c_vw") >= 5)
        .join(F.broadcast(c_left), "v")
        .join(F.broadcast(c_right), "w")
        .crossJoin(F.broadcast(n_total))
        .select("v", "w", "c_vw", portable_round(pmi, 4).alias("pmi"))
        .orderBy(F.desc("pmi"), "v", "w")
        .limit(20)
    )


_COLLOCATIONS_SQL = """
WITH words AS (
  SELECT doc_id, u.i AS pos, u.w FROM (
    SELECT doc_id,
           unnest(list_transform(
                  string_split(lower(regexp_replace(trim(COALESCE(text, '')), '\\s+', ' ', 'g')), ' '),
                  (x, i) -> struct_pack(i := i, w := x))) AS u
    FROM documents
  )
),
bigrams AS (
  SELECT doc_id, LAG(w) OVER (PARTITION BY doc_id ORDER BY pos) AS v, w
  FROM words QUALIFY v IS NOT NULL
),
c_pair AS (SELECT v, w, COUNT(*) AS c_vw FROM bigrams GROUP BY v, w),
c_left AS (SELECT v, COUNT(*) AS c_v FROM bigrams GROUP BY v),
c_right AS (SELECT w, COUNT(*) AS c_w FROM bigrams GROUP BY w),
n_total AS (SELECT COUNT(*) AS n_bigrams FROM bigrams)
SELECT v, w, CAST(c_vw AS BIGINT) AS c_vw,
       FLOOR(ln((c_vw * n_bigrams) * 1.0 / (c_v * c_w)) * 10000 + 0.5) / 10000 AS pmi
FROM c_pair JOIN c_left USING (v) JOIN c_right USING (w), n_total
WHERE c_vw >= 5
ORDER BY pmi DESC, v, w
LIMIT 20
"""

SPECS["collocations_pmi"] = QuerySpec(
    _collocations_pmi,
    _COLLOCATIONS_SQL,
    "top-20 PMI collocations over adjacent word pairs (phrase mining)",
)


# --- vocabulary coverage / OOV rate (tokenizer-fit metric) ----------------
# The train-side complement of bpe_train: given a tokenizer vocabulary,
# what fraction of each document's tokens fall outside it?  OOV rate is
# the metric that decides whether a tokenizer needs retraining on a new
# corpus and which documents a fixed-vocab model will mangle.  Scale
# shape: token counts partial-aggregate map-side (shuffle is |vocab|,
# not |tokens|); the vocabulary itself is a top-V over the |vocab|-row
# aggregate (the single-partition rank touches |vocab| rows, never the
# corpus) and joins back as a BROADCAST dimension, so the per-doc pass
# is one scan + one map-side join + one groupBy(doc_id).  V=20 exercises
# both arms on the 31-word fixture vocabulary; production V (~50k for a
# BPE vocab) changes only the broadcast size.

_VOCAB_V = 20


def _vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import whitespace_words

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(whitespace_words(F.lower(F.col("text")))).alias("word"),
    )
    wf = word_frequencies(docs, "text")
    rk = Window.orderBy(F.desc("freq"), "word")
    vocab = (
        wf.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= _VOCAB_V)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        )
    )


_VOCAB_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_WORDS_LOWER.format(c="text")}) AS word FROM documents
),
vocab AS (
  SELECT word FROM (
    SELECT word, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rk
    FROM toks GROUP BY word
  ) WHERE rk <= {_VOCAB_V}
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.word = v.word
GROUP BY t.doc_id
"""

SPECS["vocab_coverage"] = QuerySpec(
    _vocab_coverage,
    _VOCAB_COVERAGE_SQL,
    "per-doc OOV rate against the top-V corpus vocabulary (tokenizer-fit metric)",
)
