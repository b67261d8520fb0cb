"""Streaming semantics (SURVEY §2.10): AvailableNow drain, windowed agg
parity with batch, dedup-on-ingest exactly-once effect."""

from __future__ import annotations

from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.io.sources import load_table
from signal_messenger_vector_database_spark.streaming.ingest import (
    dedup_ingest_availablenow,
    windowed_counts_availablenow,
)

SF = "/root/testdata/sf0.001"


def test_windowed_counts_match_batch(spark):
    streamed = {
        (r.day, r.event_type): r.cnt
        for r in windowed_counts_availablenow(spark, SF).collect()
    }
    batch = {
        (r.day, r.event_type): r.cnt
        for r in load_table(spark, SF, "events")
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert streamed == batch


def test_dedup_ingest_exactly_once_effect(spark):
    ingested = dedup_ingest_availablenow(spark, SF)
    n_events = load_table(spark, SF, "events").count()
    # input stream was duplicated (union with itself) but dedup restores
    # exactly-once effect
    assert ingested.count() == n_events
    assert ingested.select("event_id").distinct().count() == n_events


def test_streaming_session_isolation(spark):
    """streaming_session must not leak its shuffle-partition override
    into the caller's session (concurrent batch queries keep their
    config)."""
    from signal_messenger_vector_database_spark.streaming.ingest import (
        streaming_session,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    s = streaming_session(spark, state_partitions=4)
    assert s is not spark
    assert s.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # same JVM/SparkContext: the clone shares cluster resources
    assert s.sparkContext is spark.sparkContext


def test_tws_user_totals_if_protobuf_available(spark):
    """transformWithStateInPandas (Spark 4 stateful API). Its state
    server needs a working protobuf runtime — skip where absent, the
    way the live-embedder test gates on $SMVD_EMBED_URL.

    On a real cluster, force the arm with ``SMVD_RUN_TWS=1 pytest
    tests/test_streaming.py -k tws``: the flag bypasses the import
    probe so a half-broken protobuf FAILS loudly instead of skipping —
    the difference between "not runnable here" and "silently never
    exercised"."""
    import os

    import pytest

    if not os.environ.get("SMVD_RUN_TWS"):
        pytest.importorskip("google.protobuf.descriptor")
    from signal_messenger_vector_database_spark.streaming.stateful import (
        tws_user_totals,
    )
    from signal_messenger_vector_database_spark.io.sources import load_table
    from pyspark.sql import functions as F

    got = tws_user_totals(spark, "/root/testdata/sf0.001")
    expected = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg((2 * F.count(F.lit(1))).alias("total_events"))
    )
    g = {r.user_id: r.total_events for r in got.collect()}
    e = {r.user_id: r.total_events for r in expected.collect()}
    assert g == e


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Exactly-once incremental ingest across RESTARTS: a second
    AvailableNow run against the same checkpoint must pick up only files
    that arrived after the first run — the property that lets a 100 TB
    ingest run as repeated cheap increments instead of full rescans."""
    import shutil

    from signal_messenger_vector_database_spark.streaming.ingest import (
        streaming_session,
    )

    s = streaming_session(spark, state_partitions=4)
    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    docs.limit(25).coalesce(1).write.parquet(str(tmp_path / "f1"))
    shutil.copy(
        next((tmp_path / "f1").glob("*.parquet")), src / "batch1.parquet"
    )

    def run_once():
        q = (
            s.readStream.schema(docs.schema)
            .parquet(str(src))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(str(out))
    assert first.count() == 25

    docs.subtract(docs.limit(25)).coalesce(1).write.parquet(str(tmp_path / "f2"))
    shutil.copy(
        next((tmp_path / "f2").glob("*.parquet")), src / "batch2.parquet"
    )
    run_once()
    final = spark.read.parquet(str(out))
    assert final.count() == 40  # 25 + 15, batch1 NOT reprocessed
    assert final.select("doc_id").distinct().count() == 40


def test_await_drained_raises_on_timeout():
    """A streaming query that outlives its timeout must RAISE, not silently
    return a partially-drained sink (a slowdown must never become a wrong
    answer)."""
    import pytest

    from signal_messenger_vector_database_spark.streaming.ingest import await_drained

    class _StuckQuery:
        name = "stuck"
        id = "0"
        stopped = False

        def awaitTermination(self, timeout=None):
            return False  # timed out

        def stop(self):
            self.stopped = True

    q = _StuckQuery()
    with pytest.raises(TimeoutError, match="did not drain"):
        await_drained(q, 1)
    assert q.stopped


def test_stream_ts_matches_batch_on_both_fixture_vintages(spark, tmp_path):
    """The r5 wrong-answer class: fixtures changed events.ts from INT64
    TIMESTAMP(NANOS) to timestamp[us] and the streaming reader kept its
    hard-coded nanos schema, shifting every streamed event to Jan 1970.
    Pin both vintages: streamed timestamps must equal the batch loader's."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from signal_messenger_vector_database_spark.streaming.ingest import (
        read_events_stream,
        streaming_session,
    )

    stamps = [dt.datetime(2024, 1, 1, 12, 0, 5), dt.datetime(2024, 3, 2, 7, 30)]

    def write_vintage(unit: str) -> str:
        d = tmp_path / unit
        d.mkdir()
        t = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(stamps, pa.timestamp(unit)),
                "user_id": pa.array([10, 20], pa.int64()),
                "event_type": pa.array(["a", "b"]),
                "value": pa.array([1.0, 2.0]),
                "props": pa.array(["{}", "{}"]),
            }
        )
        pq.write_table(t, str(d / "events.parquet"), version="2.6")
        return str(d)

    for unit in ("us", "ns"):
        sf_dir = write_vintage(unit)
        s = streaming_session(spark)
        sink = f"ts_vintage_{unit}"
        q = (
            read_events_stream(s, sf_dir)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{unit}"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        got = sorted(r.ts for r in s.table(sink).select("ts").collect())
        assert got == stamps, f"{unit} vintage: {got} != {stamps}"


def test_stream_reads_directory_shaped_events_table(spark, tmp_path):
    """Spark-written tables are DIRECTORIES of part files.  The stream
    source's pathGlobFilter arm matches only a flat file named
    events.parquet — against a directory it matched zero part files and
    silently drained NOTHING (0 rows, no error: the wrong-answer class).
    The directory arm must stream every part file and agree with batch."""
    sf_dir = str(tmp_path)
    ev = load_table(spark, SF, "events")
    ev.repartition(4).write.parquet(f"{sf_dir}/events.parquet")

    from signal_messenger_vector_database_spark.streaming.ingest import (
        windowed_counts_availablenow,
    )

    streamed = windowed_counts_availablenow(spark, sf_dir)
    batch = (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    got = {(r.day, r.event_type): r.cnt for r in streamed.collect()}
    want = {(r.day, r.event_type): r.cnt for r in batch.collect()}
    assert got == want and len(got) > 0
