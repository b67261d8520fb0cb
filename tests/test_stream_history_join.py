"""Streaming J2 — join against accumulated history (SURVEY hard-part #5).

The reference's reaction lookup (src/signal/format.rs:28-50) reads *past
stream history* per event.  A stateless stream-stream join can't express
'join against everything seen so far'; the Spark shape is a
foreachBatch-maintained history table: each batch joins against the log of
all PRIOR batches, then appends itself.  Two checkpoint-resumed
AvailableNow runs make batch order deterministic."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

SCHEMA = "event_id long, user_id long, kind string"


def _run(spark, src, ckpt, history_dir, matches_dir):
    stream = spark.readStream.schema(
        spark.createDataFrame([], SCHEMA).schema
    ).parquet(src)

    def with_history(batch, batch_id):
        if os.path.exists(history_dir):
            history = spark.read.parquet(history_dir)
            matched = batch.alias("b").join(
                history.alias("h"),
                (F.col("b.user_id") == F.col("h.user_id"))
                & (F.col("h.kind") == "message"),
            ).select(
                F.col("b.event_id").alias("reaction_id"),
                F.col("h.event_id").alias("target_id"),
            )
        else:
            matched = batch.limit(0).select(
                F.col("event_id").alias("reaction_id"),
                F.col("event_id").alias("target_id"),
            )
        matched.write.mode("append").parquet(matches_dir)
        batch.write.mode("append").parquet(history_dir)

    q = (
        stream.writeStream.foreachBatch(with_history)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_join_against_accumulated_history(spark):
    base = tempfile.mkdtemp(prefix="smvd-hist-")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    history_dir = os.path.join(base, "history")
    matches_dir = os.path.join(base, "matches")
    os.makedirs(src, exist_ok=True)

    # run 1: two messages arrive; nothing to react to yet
    spark.createDataFrame(
        [(1, 10, "message"), (2, 20, "message")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, ckpt, history_dir, matches_dir)
    assert spark.read.parquet(matches_dir).count() == 0

    # run 2: reactions to user 10's message + one to a user never seen
    spark.createDataFrame(
        [(3, 10, "reaction"), (4, 99, "reaction")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, ckpt, history_dir, matches_dir)
    matches = {
        (r.reaction_id, r.target_id)
        for r in spark.read.parquet(matches_dir).collect()
    }
    # reaction 3 found user 10's past message; reaction 4 dropped (no match)
    assert matches == {(3, 1)}
