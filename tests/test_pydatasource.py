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


def test_row_group_pruning_and_alignment(tmp_path):
    """Partitions are row-group-aligned, each read touches only its own
    row group, and row groups whose doc_id stats exclude every pushed
    predicate are pruned at planning time."""
    import pyarrow.parquet as pq
    from pyspark.sql.datasource import LessThanOrEqual

    from signal_messenger_vector_database_spark.io.pydatasource import (
        DocumentsReader,
    )

    # 4 row groups of 50 rows: doc_id 0-49, 50-99, 100-149, 150-199
    src = pq.read_table(PATH).sort_by("doc_id").slice(0, 200)
    multi = str(tmp_path / "multi.parquet")
    pq.write_table(src, multi, row_group_size=50)
    assert pq.ParquetFile(multi).metadata.num_row_groups == 4

    r = DocumentsReader({"path": multi, "npartitions": "8"})
    list(r.pushFilters([LessThanOrEqual(("doc_id",), 75)]))
    parts = r.partitions()
    # stats pruning: only row groups 0 (0-49) and 1 (50-99) survive
    assert {p.rg for p in parts} == {0, 1}
    rows = [
        row
        for part in parts
        for batch in r.read(part)
        for row in batch.to_pylist()
    ]
    assert sorted(row["doc_id"] for row in rows) == list(range(76))

    # no predicates -> every row group planned, ranges tile per row group
    r2 = DocumentsReader({"path": multi, "npartitions": "8"})
    by_rg: dict[int, list[tuple[int, int]]] = {}
    for p in r2.partitions():
        by_rg.setdefault(p.rg, []).append((p.start, p.end))
    assert set(by_rg) == {0, 1, 2, 3}
    for ranges in by_rg.values():
        ranges.sort()
        assert ranges[0][0] == 0 and ranges[-1][1] == 50
        for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
            assert e1 == s2


def test_pyds_scan_leaves_caller_config_untouched(spark):
    """_pyds_scan must not flip spark.sql.python.filterPushdown.enabled
    (or anything else) on the caller's session — it runs on a clone."""
    from signal_messenger_vector_database_spark.plans.formats import SPECS

    key = "spark.sql.python.filterPushdown.enabled"
    before = spark.conf.get(key, None)
    df = SPECS["pyds_scan"].fn(spark, SF_SMALL)
    assert df.count() > 0
    assert spark.conf.get(key, None) == before


def test_reader_plans_over_directory_shaped_table(spark, tmp_path):
    """Spark-written tables are directories of part files: planning must
    enumerate every part file's row groups (a single-file ParquetFile
    open raised on a directory before r7), and pushdown must still prune
    per part-file statistics."""
    from signal_messenger_vector_database_spark.io.pydatasource import (
        DocumentsReader,
    )

    table_dir = str(tmp_path / "documents.parquet")
    docs = spark.read.parquet(PATH)
    docs.repartition(4, "doc_id").write.parquet(table_dir)
    n = docs.count()

    r = DocumentsReader({"path": table_dir, "npartitions": "8"})
    parts = r.partitions()
    assert len({p.file for p in parts}) == 4  # every part file planned
    rows = [
        row
        for part in parts
        for batch in r.read(part)
        for row in batch.to_pylist()
    ]
    assert len(rows) == n
    assert {row["doc_id"] for row in rows} == {
        r2.doc_id for r2 in docs.collect()
    }
