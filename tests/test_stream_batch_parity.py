"""§3.3 shared-operator principle: the SAME ingest_pipeline transformation
applied to a batch DataFrame and inside foreachBatch over a stream of the
same rows must produce identical results (modulo run-scoped id/timestamp).
This is the architectural property the reference gets by calling
format_message from both its live loop and its history read path."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.operators.ingest_pipeline import ingest_pipeline

ROWS = [
    ("from", "alice", None, "a normal message"),
    ("from", "bob", None, "is typing..."),  # suppressed
    ("to", "carol", "g", " ".join(f"w{i}" for i in range(40))),  # chunks at 16/12
    ("from", "dave", None, ""),
]
SCHEMA = "direction string, contact string, group_name string, body string"


def _project(df):
    return sorted(
        (r.body, r.direction, r.contact, r.tokens, tuple(r.embedding))
        for r in df.select("body", "direction", "contact", "tokens", "embedding").collect()
    )


def test_batch_and_streaming_ingest_agree(spark):
    batch_in = spark.createDataFrame(ROWS, SCHEMA).withColumn(
        "attachments", F.lit(None).cast("array<string>")
    )
    batch_out = _project(
        ingest_pipeline(batch_in, embedding_dim=8, ideal_token_size=16)
    )

    # stage the same rows as a parquet dataset and stream them (the write
    # target must BE the streamed directory — a nested dataset dir is not
    # listed by the file stream source)
    src = os.path.join(tempfile.mkdtemp(prefix="smvd-parity-src-"), "data")
    out_dir = os.path.join(tempfile.mkdtemp(prefix="smvd-parity-out-"), "emb")
    batch_in.write.parquet(src)

    stream = (
        spark.readStream.schema(batch_in.schema)
        .parquet(src)
    )

    def run_pipeline(bdf, batch_id):
        ingest_pipeline(bdf, embedding_dim=8, ideal_token_size=16).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(run_pipeline)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="smvd-parity-ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    stream_out = _project(spark.read.parquet(out_dir))
    assert stream_out == batch_out
    # 1 normal + 4 chunks (40 words / 12-word chunks) + 1 empty; 1 suppressed
    assert len(batch_out) == 6
