"""F6 error-row filtering: the reference silently drops undecodable rows
(filter_map(Result::ok), src/lib.rs:212,314,359).  Spark equivalents:
DROPMALFORMED reads and null-tolerant expressions."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.operators.sink import write_compacted


def test_dropmalformed_json(spark):
    d = tempfile.mkdtemp(prefix="smvd-f6-")
    p = os.path.join(d, "rows.json")
    with open(p, "w") as f:
        f.write('{"id": 1, "v": 10}\n')
        f.write("this is not json at all\n")
        f.write('{"id": 2, "v": 20}\n')
        f.write('{"id": "not-a-number", "v": 30}\n')  # schema-violating
    df = (
        spark.read.schema("id long, v long")
        .option("mode", "DROPMALFORMED")
        .json(p)
    )
    rows = sorted((r.id, r.v) for r in df.collect() if r.id is not None)
    assert rows == [(1, 10), (2, 20)]


def test_null_tolerant_expressions(spark):
    # get_json_object on junk -> null, filtered; no exception anywhere
    df = spark.createDataFrame(
        [('{"k": 5}',), ("garbage",), (None,)], "props string"
    )
    k = F.get_json_object("props", "$.k").cast("int")
    out = df.select(k.alias("k")).filter(F.col("k").isNotNull()).collect()
    assert [r.k for r in out] == [5]


def test_write_compacted_bounds_file_count(spark):
    d = os.path.join(tempfile.mkdtemp(prefix="smvd-compact-"), "out")
    df = spark.range(10000).repartition(16)  # 16 input partitions
    write_compacted(df, d, target_files=2)
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) <= 2
    assert spark.read.parquet(d).count() == 10000


def test_r8_operators_tolerate_degenerate_documents(spark):
    """Null text, empty text, unicode, and sub-window-length docs must
    flow through every r8 document operator without exceptions, with the
    documented degenerate outputs (F6's null-tolerance discipline)."""
    rows = [
        (0, None, "en", "a", 0),
        (1, "", "en", "a", 0),
        (2, "héllo wörld ünïcode — em-dash and émojis 🎉 here", "en", "b", 48),
        (3, "x", "en", "b", 1),
        (4, "plain english words repeated words repeated words", "en", "c", 49),
    ]
    d = tempfile.mkdtemp(prefix="smvd-r8-degen-")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.parquet(os.path.join(d, "documents.parquet"))

    from signal_messenger_vector_database_spark.operators.bpe_train import (
        bpe_train_merges,
        piece_frequencies,
    )
    from signal_messenger_vector_database_spark.plans.traindata import (
        _dup_substring_spans,
        _token_budget_waterfill,
    )

    spans = {r.doc_id: r for r in _dup_substring_spans(spark, d).collect()}
    assert set(spans) == {0, 1, 2, 3, 4}
    # every doc here is shorter than the 64-char window -> zero windows
    assert all(r.n_windows == 0 and r.dup_frac is None for r in spans.values())

    wf = _token_budget_waterfill(spark, d).collect()
    assert {r.source for r in wf} == {"a", "b", "c"}
    zero = [r for r in wf if r.tokens == 0]
    assert all(r.sample_rate is None for r in zero)  # NULLIF guard, no div0

    # trainer: null/empty docs contribute no pieces; merges still learn
    pf = piece_frequencies(
        spark.read.parquet(os.path.join(d, "documents.parquet"))
    ).collect()
    assert all(r.freq > 0 for r in pf)
    merges = bpe_train_merges(
        spark, spark.read.parquet(os.path.join(d, "documents.parquet")), 4
    ).collect()
    assert all(r.pair_count >= 2 for r in merges)


def test_user_trend_degenerate_groups_and_nulls(spark):
    """The r8 code-review findings, pinned: (a) a single-event user's
    slope is NULL in BOTH engines (Arrow renders the pandas NaN as NULL,
    and Spark's floor-based rounding must never collapse the degenerate
    arm to a fabricated 0.0), and (b) null ts/value rows are dropped
    before the grouped map instead of crashing int(NaN)."""
    import math

    from pyspark.sql import Row
    from signal_messenger_vector_database_spark.operators.groupedmap import (
        per_user_trend,
    )
    from signal_messenger_vector_database_spark.plans.analytics import (
        _USER_TREND_SQL,
    )
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(event_id=1, ts=t0, user_id=1, event_type="view", value=10.0, props=None),
        # user 2: two events -> real slope
        Row(event_id=2, ts=t0, user_id=2, event_type="view", value=10.0, props=None),
        Row(event_id=3, ts=t0 + datetime.timedelta(hours=1), user_id=2,
            event_type="view", value=46.0, props=None),
        # user 3: the null rows the reference silently drops (F6)
        Row(event_id=4, ts=None, user_id=3, event_type="view", value=5.0, props=None),
        Row(event_id=5, ts=t0, user_id=3, event_type="view", value=None, props=None),
        Row(event_id=6, ts=t0, user_id=3, event_type="view", value=7.0, props=None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r.user_id: r for r in per_user_trend(ev).collect()}
    # single-event user: den == 0 -> NULL (Arrow renders pandas NaN as
    # NULL, so NULL is the only cross-engine-stable encoding) — and
    # never a fabricated 0.0 through the floor-based rounding
    assert got[1].slope is None
    # two clean events: slope = 36 units/hour, exactly
    assert got[2].n == 2 and abs(got[2].slope - 36.0) < 1e-9
    # null rows dropped, no crash; the surviving event makes a 1-row group
    assert got[3].n == 1 and got[3].slope is None
    # and the full plan (with the NaN-bypassing rounding) agrees with the
    # oracle on the same data
    import duckdb
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="smvd-ut-degen-")
    ev.write.parquet(os.path.join(d, "events.parquet"))
    con = duckdb.connect()
    # Spark writes a DIRECTORY-shaped table; DuckDB needs the part glob
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    from signal_messenger_vector_database_spark.plans.analytics import _user_trend
    from tools.oracle_check import canon_rows

    sdf = _user_trend(spark, d)
    srows = sdf.collect()
    cur = con.execute(_USER_TREND_SQL)
    ocols = [c[0] for c in cur.description]
    orows = cur.fetchall()
    assert canon_rows(srows, sdf.columns) == canon_rows(orows, ocols)
