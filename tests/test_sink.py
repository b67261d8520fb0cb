"""K1/K2 sink: idempotent DDL bootstrap + atomic append round trip."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.operators.ingest_pipeline import ingest_pipeline
from signal_messenger_vector_database_spark.operators.sink import (
    append_embeddings,
    ensure_embeddings_table,
    timestamped_filename,
)


def test_ddl_idempotent_and_append(spark):
    name = f"embeddings_out_{uuid.uuid4().hex[:8]}"
    ensure_embeddings_table(spark, name)
    ensure_embeddings_table(spark, name)  # IF NOT EXISTS: second call no-op

    msgs = spark.createDataFrame(
        [("from", "alice", None, "hello there")],
        "direction string, contact string, group_name string, body string",
    ).withColumn("attachments", F.lit(None).cast("array<string>"))
    out = ingest_pipeline(msgs, embedding_dim=8)
    append_embeddings(out, name)
    append_embeddings(out, name)  # append-only: 2 batches

    got = spark.table(name)
    assert got.count() == 2
    assert [f.name for f in got.schema.fields] == [
        "id", "body", "direction", "contact", "group_name",
        "attachments", "tokens", "embedding", "created_at",
    ]
    spark.sql(f"DROP TABLE {name}")


def test_timestamped_filename(spark):
    df = spark.createDataFrame(
        [("image/png", None), ("image/jpeg", "cat.jpg"), ("application/x-unknown", None)],
        "mime string, orig string",
    )
    rows = df.select(
        timestamped_filename("mime", "orig").alias("fname"), "mime"
    ).collect()
    by_mime = {r.mime: r.fname for r in rows}
    assert by_mime["image/png"].endswith(".png")
    assert by_mime["image/jpeg"].endswith("-cat.jpg")  # collision prefixing
    assert by_mime["application/x-unknown"].endswith(".bin")  # fallback ext


def test_merge_upsert_versioned(spark):
    from signal_messenger_vector_database_spark.operators.sink import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)], "k int, v string, ver int"
    )
    # two updates for key 1 — the higher version must win; key 9 is an insert
    updates = spark.createDataFrame(
        [(1, "a2", 5), (1, "a3", 7), (9, "new", 1)], "k int, v string, ver int"
    )
    got = {
        r.k: (r.v, r.ver)
        for r in merge_upsert(base, updates, ["k"], version_col="ver").collect()
    }
    assert got == {1: ("a3", 7), 2: ("b", 0), 3: ("c", 0), 9: ("new", 1)}
    # prefer_updates=False: base rows shadow updates, inserts still appear
    kept = {
        r.k: r.v
        for r in merge_upsert(
            base, updates, ["k"], prefer_updates=False, version_col="ver"
        ).collect()
    }
    assert kept[1] == "a" and kept[9] == "new"
