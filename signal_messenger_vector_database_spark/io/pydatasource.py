"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The reference reads its corpus through engine-native scans (SURVEY §2.1,
src/lib.rs table scans); Spark's equivalent extensibility point for a
source the built-in readers don't cover is the Python DataSource API:
schema discovery on the driver, partition planning (``partitions()``),
Arrow-batch reads per partition on executors, and filter pushdown
(``pushFilters``) so selective predicates prune at the source.

``smvd_documents`` wraps the documents parquet through that API — the
format itself is deliberately boring so the PLUMBING is the deliverable:

- partitions: fixed row ranges over the file (real sources split by
  file / row group / byte range; the fixture is one small file);
- reads: pyarrow slices yielded as RecordBatches (the Arrow fast path —
  rows never cross Python one at a time);
- pushdown: comparison filters on ``doc_id`` are accepted and applied
  inside the pyarrow read; everything else is returned to Spark.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

_COLUMNS = ["doc_id", "source", "text"]


class DocumentsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "smvd_documents"

    def schema(self) -> str:
        return "doc_id bigint, source string, text string"

    def reader(self, schema) -> "DocumentsReader":
        return DocumentsReader(self.options)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class DocumentsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.n_parts = int(options.get("npartitions", "8"))
        # (op, value) predicates on doc_id accepted by pushFilters
        self.doc_id_preds: list[tuple[str, int]] = []

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            accepted = None
            if isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                col = f.attribute[0] if f.attribute else None
                if col == "doc_id" and isinstance(f.value, int):
                    accepted = (type(f).__name__, f.value)
            if accepted is not None:
                self.doc_id_preds.append(accepted)
            else:
                yield f  # not pushable -> Spark keeps it

    def partitions(self):
        import pyarrow.parquet as pq

        n_rows = pq.ParquetFile(self.path).metadata.num_rows
        step = max(1, (n_rows + self.n_parts - 1) // self.n_parts)
        return [
            _Range(start, min(start + step, n_rows))
            for start in range(0, n_rows, step)
        ]

    def read(self, partition: _Range):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        table = pq.read_table(self.path, columns=_COLUMNS)
        table = table.slice(partition.start, partition.end - partition.start)
        ops = {
            "EqualTo": "equal",
            "GreaterThan": "greater",
            "GreaterThanOrEqual": "greater_equal",
            "LessThan": "less",
            "LessThanOrEqual": "less_equal",
        }
        for op, value in self.doc_id_preds:
            mask = getattr(pc, ops[op])(table.column("doc_id"), value)
            table = table.filter(mask)
        yield from table.to_batches(max_chunksize=4096)
