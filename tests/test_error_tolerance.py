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
