"""Custom Python DataSource (io/pydatasource.py): partition planning,
Arrow-batch reads, and doc_id filter pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

PATH = f"{SF_SMALL}/documents.parquet"


def test_reader_pushes_doc_id_filters_and_returns_rest():
    from pyspark.sql.datasource import EqualTo, LessThan, StringStartsWith

    from signal_messenger_vector_database_spark.io.pydatasource import (
        DocumentsReader,
    )

    r = DocumentsReader({"path": PATH, "npartitions": "2"})
    not_pushed = list(
        r.pushFilters(
            [
                LessThan(("doc_id",), 10),
                EqualTo(("source",), "web"),  # wrong column -> stays in Spark
                StringStartsWith(("text",), "a"),  # wrong type -> stays
            ]
        )
    )
    assert r.doc_id_preds == [("LessThan", 10)]
    assert len(not_pushed) == 2

    rows = [
        row
        for part in r.partitions()
        for batch in r.read(part)
        for row in batch.to_pylist()
    ]
    assert rows and all(row["doc_id"] < 10 for row in rows)


def test_partitions_cover_file_exactly():
    from signal_messenger_vector_database_spark.io.pydatasource import (
        DocumentsReader,
    )

    r = DocumentsReader({"path": PATH, "npartitions": "8"})
    parts = r.partitions()
    assert len(parts) >= 2
    covered = sorted((p.start, p.end) for p in parts)
    assert covered[0][0] == 0
    for (s1, e1), (s2, e2) in zip(covered, covered[1:]):
        assert e1 == s2, "partition ranges must tile without gap/overlap"


def test_pyds_matches_native_parquet_read(spark):
    from signal_messenger_vector_database_spark.io.pydatasource import (
        DocumentsSource,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DocumentsSource)
    via_ds = (
        spark.read.format("smvd_documents")
        .option("path", PATH)
        .load()
        .filter(F.col("doc_id") <= 100)
    )
    native = (
        spark.read.parquet(PATH)
        .select("doc_id", "source", "text")
        .filter(F.col("doc_id") <= 100)
    )
    assert sorted(map(tuple, via_ds.collect())) == sorted(
        map(tuple, native.collect())
    )
