"""Watermark late-data semantics across checkpoint-resumed runs: an event
older than the watermark (persisted in the checkpoint from run 1) is
dropped in run 2 — the §2.10 late-data upgrade the reference lacks."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime

from pyspark.sql import functions as F

SCHEMA = "event_id long, ts timestamp, user_id long"


def _write(spark, src, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _drain(spark, src, ckpt, out_dir):
    # foreachBatch -> parquet: unlike the memory sink, this supports
    # checkpoint recovery, which the cross-run watermark state needs
    agg = (
        spark.readStream.schema(
            spark.createDataFrame([], SCHEMA).schema
        ).parquet(src)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.date_format("window.start", "HH:mm").alias("wstart"), "cnt")
    )

    def sink(bdf, batch_id):
        bdf.write.mode("append").parquet(out_dir)

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _ts(h, m=0):
    return datetime(2024, 3, 1, h, m)


def test_late_event_dropped_after_watermark(spark):
    base = tempfile.mkdtemp(prefix="smvd-wm-")
    src = os.path.join(base, "src")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src, exist_ok=True)

    # run 1: events in [10:00, 11:00) + one at 12:30 that advances the
    # watermark to 12:00 on completion
    _write(spark, src, [(1, _ts(10, 5), 1), (2, _ts(10, 50), 1), (3, _ts(12, 30), 1)], "a")
    _drain(spark, src, ckpt, out_dir)
    out1 = {r.wstart: r.cnt for r in spark.read.parquet(out_dir).collect()}
    # [10:00,11:00) closed (watermark 12:00 past its end); [12,13) still open
    assert out1 == {"10:00": 2}

    # run 2 (checkpoint resume): a 9:00 event is far behind the persisted
    # watermark -> dropped; a 13:30 event advances the watermark to 13:00,
    # closing [12,13) with only the original event counted
    _write(spark, src, [(4, _ts(9, 0), 1), (5, _ts(13, 30), 1)], "b")
    _drain(spark, src, ckpt, out_dir)
    out2 = {r.wstart: r.cnt for r in spark.read.parquet(out_dir).collect()}
    assert "09:00" not in out2  # late event's window never materializes
    assert out2.get("12:00") == 1  # closed without the late row
