"""Pipeline observability: `observe` attaches named metrics to a
DataFrame that are computed DURING the action (no second scan) — at
100 TB a separate metrics pass costs as much as the job itself, so
row-count / null-rate / domain checks must piggyback on the write."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.io.sources import load_table
from signal_messenger_vector_database_spark.operators.suppression import (
    filter_control_messages,
)

SF = "/root/testdata/sf0.001"


def test_observe_metrics_single_pass(spark):
    docs = load_table(spark, SF, "documents")
    obs = Observation("docs_metrics")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("null_texts"),
        F.min("n_chars").alias("min_chars"),
    )
    n = observed.filter(F.col("n_chars") >= 0).count()  # one action
    got = obs.get
    assert got["n_rows"] == docs.count() == n + 0  # filter keeps all rows
    assert got["null_texts"] == 0
    assert got["min_chars"] >= 0


def test_observe_suppression_drop_rate(spark):
    # The F1 suppression filter instrumented in-flight: input size comes
    # from the observation, output size from the action itself.
    msgs = spark.createDataFrame(
        [("hello",), ("is typing...",), ("new story: x",), ("ok",)],
        "body string",
    )
    obs = Observation("pre_filter")
    kept = filter_control_messages(
        msgs.observe(obs, F.count(F.lit(1)).alias("n_in")), body_col="body"
    )
    n_out = kept.count()
    assert n_out == 2
    assert obs.get["n_in"] == 4
