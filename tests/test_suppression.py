"""F1 suppression filter — all 14 reference patterns
(src/signal/process_incoming_message.rs:106-120)."""

from __future__ import annotations

from signal_messenger_vector_database_spark.operators.suppression import (
    SUPPRESSED_EXACT,
    SUPPRESSED_PREFIXES,
    filter_control_messages,
)


def test_all_exact_patterns_drop(spark):
    df = spark.createDataFrame([(s,) for s in SUPPRESSED_EXACT], "body string")
    assert filter_control_messages(df).count() == 0


def test_all_prefix_patterns_drop(spark):
    rows = [(p,) for p in SUPPRESSED_PREFIXES] + [
        (p + " anything after", ) for p in SUPPRESSED_PREFIXES
    ]
    df = spark.createDataFrame(rows, "body string")
    assert filter_control_messages(df).count() == 0


def test_normal_messages_pass(spark):
    rows = [
        ("hello world",),
        ("presage is a library",),  # exact match ONLY when whole body
        ("prefix mismatch: Reacted without trailing space",),
        (None,),  # None -> "" -> kept (reference unwrap_or behavior)
        ("",),
    ]
    df = spark.createDataFrame(rows, "body string")
    assert filter_control_messages(df).count() == 5


def test_prefix_is_not_substring_match(spark):
    # "got Read receipt" only suppresses as a *prefix*
    df = spark.createDataFrame([("yesterday I got Read receipt",)], "body string")
    assert filter_control_messages(df).count() == 1
