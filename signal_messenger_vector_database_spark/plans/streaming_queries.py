"""Streaming query surface (SURVEY §2.10).

The streaming queries run a real Structured Streaming job
(Trigger.AvailableNow — the reference's drain-until-QueueEmpty) and return
the materialized result; the oracle checks the *final state* with plain
SQL, which is exactly the correctness contract of a drained stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from ..streaming.ingest import (
    await_drained,
    dedup_ingest_availablenow,
    dedup_within_watermark_availablenow,
    read_events_stream,
    streaming_session,
    windowed_counts_availablenow,
)
from .registry import QuerySpec


def _stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the J1 shape applied DURING
    streaming, which is exactly the reference's per-event contact lookup
    (src/signal/format.rs:58-68 called from the receive loop).  The static
    dim is broadcast once; every micro-batch joins against it."""
    import uuid

    spark = streaming_session(spark)
    stream = read_events_stream(spark, sf_dir)
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 150)
        .select((F.col("c_custkey") - 1).alias("user_id"), "c_mktsegment")
    )
    joined = stream.join(F.broadcast(dim), "user_id", "left")
    agg = joined.groupBy(
        F.coalesce(F.col("c_mktsegment"), F.lit("<unknown>")).alias("segment")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    sink = f"stream_static_{uuid.uuid4().hex[:8]}"
    import tempfile

    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="smvd-ckpt-ss-"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q)
    return spark.table(sink)


_STREAM_STATIC_JOIN_SQL = """
SELECT COALESCE(c_mktsegment, '<unknown>') AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
                       WHERE c_custkey <= 150) d
  ON d.c_custkey = events.user_id + 1
GROUP BY 1
"""


def _stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_counts_availablenow(spark, sf_dir)


_STREAM_WINDOWED_COUNTS_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type, CAST(COUNT(*) AS BIGINT) AS cnt
FROM events GROUP BY 1, 2
"""


def _stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ingested = dedup_ingest_availablenow(spark, sf_dir)
    return ingested.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("event_id").alias("n_distinct"),
    )


_STREAM_DEDUP_COUNTS_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
"""


def _stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import stateful_user_totals

    return stateful_user_totals(spark, sf_dir)


# The source is fed twice (two micro-batches), so the stateful counter's
# final per-user totals are exactly 2x the batch aggregate.
_STREAM_STATEFUL_TOTALS_SQL = """
SELECT user_id,
       CAST(2 * COUNT(*) AS BIGINT) AS total_events,
       ROUND(2 * SUM(value), 2) AS total_value
FROM events GROUP BY user_id
"""


def _stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time range condition:
    purchases within 1 hour after a click by the same user.

    Both sides carry watermarks so the join state is bounded — at 100 TB
    of stream history this is what keeps the state store finite: a click
    older than (watermark - 1 hour) can never match a future purchase and
    is evicted.  Over a drained AvailableNow run the result equals the
    batch time-range join, which is the oracle."""
    import tempfile
    import uuid

    spark = streaming_session(spark)
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    sink = f"stream_stream_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="smvd-ckpt-ssj-"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q)
    return spark.table(sink)


_STREAM_STREAM_JOIN_SQL = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM events c JOIN events p
  ON c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
"""


def _stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ingested = dedup_within_watermark_availablenow(spark, sf_dir)
    return ingested.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("event_id").alias("n_distinct"),
    )


# Every event exactly once: identical contract to the unbounded-state
# dedup, but with watermark-evicted state.
_STREAM_DEDUP_WATERMARK_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
"""


SPECS: dict[str, QuerySpec] = {
    "stream_dedup_watermark": QuerySpec(
        _stream_dedup_watermark,
        _STREAM_DEDUP_WATERMARK_SQL,
        "dropDuplicatesWithinWatermark: bounded-state streaming dedup",
    ),
    "stream_stream_join": QuerySpec(
        _stream_stream_join,
        _STREAM_STREAM_JOIN_SQL,
        "watermarked stream-stream interval join (clicks -> purchases)",
    ),
    "stream_static_join": QuerySpec(
        _stream_static_join,
        _STREAM_STATIC_JOIN_SQL,
        "stream-static broadcast enrichment join (the J1 shape in streaming)",
    ),
    "stream_stateful_totals": QuerySpec(
        _stream_stateful_totals,
        _STREAM_STATEFUL_TOTALS_SQL,
        "applyInPandasWithState running totals across micro-batches",
    ),
    "stream_windowed_counts": QuerySpec(
        _stream_windowed_counts,
        _STREAM_WINDOWED_COUNTS_SQL,
        "tumbling-window counts via AvailableNow streaming agg",
    ),
    "stream_dedup_counts": QuerySpec(
        _stream_dedup_counts,
        _STREAM_DEDUP_COUNTS_SQL,
        "duplicated stream -> dropDuplicates -> foreachBatch append (exactly-once effect)",
    ),
}


# --- streaming session windows -------------------------------------------
# session_window works in streaming with a watermark; AvailableNow drains
# the fixture, so the final state must equal the BATCH sessionization of
# the same data — the oracle is the same lag+cumsum SQL the batch
# `sessionize` query is checked against (two Spark execution modes and an
# independent SQL formulation, all agreeing).


def _stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    spark = streaming_session(spark)
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "session_value",
        )
    )
    sink = f"stream_sessionize_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="smvd-ckpt-sess-"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q)
    return spark.table(sink)


def _stream_sessionize_sql() -> str:
    from .analytics import _SESSIONIZE_SQL

    return _SESSIONIZE_SQL


SPECS["stream_sessionize"] = QuerySpec(
    _stream_sessionize,
    _stream_sessionize_sql(),
    "streaming session_window + watermark (AvailableNow) == batch sessionization",
)


def _stream_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile sketch's STREAMING story: bin-count state accumulates
    across micro-batches (a streaming groupBy over (event_type, bin) —
    state is bounded at 256 bins x |types| regardless of how many events
    flow through, which is exactly the mergeable-sketch property the
    batch twin's merge==full test proves), then the drained histogram
    feeds the same quantile-pick as batch.  Bin geometry (per-type
    min/max) is FROZEN from the historical table before the stream
    starts — how production sketches handle unbounded input (a new
    out-of-range value clips into the edge bin rather than rebinning
    history).  Oracle: the batch sketch SQL verbatim — a drained
    AvailableNow run over the same rows must land the identical
    histogram, hence identical quantiles."""
    import tempfile
    import uuid

    from .analytics import _qsk_bin_expr, _qsk_inputs, _qsk_quantile_pick

    spark = streaming_session(spark)
    _, rng = _qsk_inputs(spark, sf_dir)
    stream = read_events_stream(spark, sf_dir).filter(
        F.col("value").isNotNull()
    )
    binned = stream.join(F.broadcast(rng), "event_type").select(
        "event_type", _qsk_bin_expr().alias("bin")
    )
    hist = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    sink = f"stream_qsk_{uuid.uuid4().hex[:8]}"
    q = (
        hist.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="smvd-ckpt-qsk-"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q)
    return _qsk_quantile_pick(spark.table(sink), rng)


def _stream_sketch_quantiles_sql() -> str:
    from .analytics import _SKETCH_QUANTILES_SQL

    return _SKETCH_QUANTILES_SQL


SPECS["stream_sketch_quantiles"] = QuerySpec(
    _stream_sketch_quantiles,
    _stream_sketch_quantiles_sql(),
    "streaming quantile sketch: bounded bin-count state across micro-batches == the batch sketch",
)
