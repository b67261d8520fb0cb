"""as-of / interval join semantics (strict vs non-strict, no-match drop)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.operators.joins import asof_join, interval_join


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_asof_strict_prior(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(12), "p2"), (2, _ts(9), "p3")],
        "user long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(9), 100.0), (1, _ts(11), 200.0), (1, _ts(12), 300.0)],
        "user long, ts timestamp, value double",
    )
    rows = {
        r.tag: (r.asof_ts, r.asof_value)
        for r in asof_join(left, right, on="user", right_value_cols=("value",)).collect()
    }
    assert rows["p1"] == (_ts(9), 100.0)
    # strict: the 12:00 right row is NOT visible to the 12:00 left row
    assert rows["p2"] == (_ts(11), 200.0)
    assert "p3" not in rows  # user 2 has no prior right row -> dropped


def test_asof_non_strict_includes_equal_ts(spark):
    left = spark.createDataFrame([(1, _ts(12), "p")], "user long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts(12), 7.0)], "user long, ts timestamp, value double")
    rows = asof_join(left, right, on="user", right_value_cols=("value",), strict=False).collect()
    assert len(rows) == 1 and rows[0].asof_value == 7.0


def test_interval_join_bounds(spark):
    clicks = spark.createDataFrame(
        [(1, _ts(10, 0), "in-start"), (1, _ts(10, 59), "in-end"), (1, _ts(11, 0), "out")],
        "user long, ts timestamp, tag string",
    )
    signups = spark.createDataFrame([(1, _ts(10))], "user long, s_ts timestamp")
    got = {
        r["tag"]
        for r in interval_join(
            clicks, signups, on="user", left_ts="ts",
            right_start=F.col("r.s_ts"),
            right_end=F.col("r.s_ts") + F.expr("INTERVAL 1 HOUR"),
        ).collect()
    }
    assert got == {"in-start", "in-end"}  # [start, end)
