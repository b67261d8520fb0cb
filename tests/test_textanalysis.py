from __future__ import annotations

from signal_messenger_vector_database_spark.operators.textanalysis import (
    ROLLING_HASH_BASE,
    ROLLING_HASH_MOD,
    language_id,
    quality_features,
    rolling_hash,
)


def test_language_id_markers(spark):
    rows = [
        (0, "the cat is on the mat and a dog"),
        (1, "el gato es de la casa y que bien"),
        (2, "der hund ist ein gutes tier und die katze"),
        (3, "xyzzy qwerty plugh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.lang for r in df.select("doc_id", language_id("text").alias("lang")).collect()}
    assert got == {0: "en", 1: "es", 2: "de", 3: "und"}


def test_quality_score_bounds(spark):
    rows = [(0, "good clean text with the usual words of a sentence"), (1, "@@@!!!"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = quality_features("text")
    out = {r.doc_id: r for r in df.select("doc_id", *[c.alias(n) for n, c in feats.items()]).collect()}
    for r in out.values():
        assert 0.0 <= r.quality_score <= 1.0
    assert out[0].quality_score > out[1].quality_score


def test_rolling_hash_matches_python(spark):
    texts = ["hello", "", "a b c", "Spark!"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {r.i: r.fp for r in df.select("i", rolling_hash("text").alias("fp")).collect()}

    def py_hash(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * ROLLING_HASH_BASE + ord(ch)) % ROLLING_HASH_MOD
        return h

    for i, t in enumerate(texts):
        assert got[i] == py_hash(t), t
