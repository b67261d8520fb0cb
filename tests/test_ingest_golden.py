"""Golden end-to-end ingest test (SURVEY §5.3): fixed synthetic message
log -> full pipeline -> embeddings-table snapshot, with the reference-shaped
fixture from FIXTURES.md (suppression patterns, reaction/quote rows, empty
body, chunk-boundary bodies)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.operators.ingest_pipeline import ingest_pipeline
from signal_messenger_vector_database_spark.operators.suppression import (
    SUPPRESSED_EXACT,
    SUPPRESSED_PREFIXES,
)


@pytest.fixture(scope="module")
def message_log(spark):
    rows = []
    # all 14 control patterns (must be dropped)
    for s in SUPPRESSED_EXACT:
        rows.append(("from", "alice", None, s))
    for p in SUPPRESSED_PREFIXES:
        rows.append(("from", "bob", None, p + " details"))
    # quote-shaped render (src/signal/format.rs:26) — kept; a rendered
    # reaction ("Reacted with ...") is covered by the prefix rows above
    rows.append(("to", "carol", None, 'Answer to message "hi": hello back'))
    rows.append(("from", "dave", "g1", "plain message in a group"))
    rows.append(("from", "erin", None, ""))  # empty body
    # chunk boundary: 600 words > 512 tokens -> 2 chunks
    rows.append(("from", "frank", None, " ".join(f"w{i}" for i in range(600))))
    rows.append(("to", "grace", None, "short normal message"))
    return spark.createDataFrame(
        [(d, c, g, b) for d, c, g, b in rows],
        "direction string, contact string, group_name string, body string",
    ).withColumn("attachments", F.lit(None).cast("array<string>"))


def test_golden_pipeline(spark, message_log):
    out = ingest_pipeline(message_log, embedding_dim=16)
    rows = out.collect()

    # schema matches the reference's embeddings table shape
    assert [f.name for f in out.schema.fields] == [
        "id", "body", "direction", "contact", "group_name",
        "attachments", "tokens", "embedding", "created_at",
    ]

    # 14 control rows suppressed; kept: quote-answer, group msg, empty,
    # 600-worder (as 2 chunks), short = 6 output rows
    bodies = sorted(r.body for r in rows)
    assert len(rows) == 6
    assert 'Answer to message "hi": hello back' in bodies
    assert "" in bodies  # empty body passes F1 and the short path

    # chunk rows carry per-chunk text + counts (intended semantics, T5 fixed)
    frank = [r for r in rows if r.contact == "frank"]
    assert len(frank) == 2
    assert {len(r.body.split()) for r in frank} == {384, 216}
    assert all(r.tokens == len(r.body.split()) for r in frank)

    # embeddings: right dim, deterministic
    assert all(len(r.embedding) == 16 for r in rows)
    ids = [r.id for r in rows]
    assert len(set(ids)) == len(ids)  # unique (not necessarily dense)


def test_pipeline_idempotent_rerun(spark, message_log):
    a = ingest_pipeline(message_log, embedding_dim=8).select("body", "tokens", "embedding")
    b = ingest_pipeline(message_log, embedding_dim=8).select("body", "tokens", "embedding")
    ra = sorted(map(str, a.collect()))
    rb = sorted(map(str, b.collect()))
    assert ra == rb
