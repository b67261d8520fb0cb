"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The reference reads its corpus through engine-native scans (SURVEY §2.1,
src/lib.rs table scans); Spark's equivalent extensibility point for a
source the built-in readers don't cover is the Python DataSource API:
schema discovery on the driver, partition planning (``partitions()``),
Arrow-batch reads per partition on executors, and filter pushdown
(``pushFilters``) so selective predicates prune at the source.

``smvd_documents`` wraps the documents parquet through that API — the
format itself is deliberately boring so the PLUMBING is the deliverable:

- partitions: ROW-GROUP-aligned row ranges — each partition belongs to
  exactly one parquet row group and its read touches only that row
  group's bytes (``ParquetFile.read_row_group``), never the whole file;
  row groups whose doc_id min/max statistics cannot satisfy the pushed
  predicates are pruned at PLANNING time, before any executor runs;
- reads: pyarrow row-group reads yielded as RecordBatches (the Arrow
  fast path — rows never cross Python one at a time);
- pushdown: comparison filters on ``doc_id`` prune row groups via
  footer statistics and mask residual rows inside the pyarrow read;
  everything else is returned to Spark.
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
    """A row range WITHIN one row group of one part file: ``start``/
    ``end`` are local row offsets inside row group ``rg`` of ``file``."""

    def __init__(self, file: str | None, rg: int, start: int, end: int):
        self.file, self.rg, self.start, self.end = file, rg, start, end


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

    def _rg_may_match(self, lo: int, hi: int) -> bool:
        """Can a row group with doc_id in [lo, hi] satisfy every pushed
        predicate?  False => the whole row group is skipped at planning."""
        checks = {
            "EqualTo": lambda v: lo <= v <= hi,
            "GreaterThan": lambda v: hi > v,
            "GreaterThanOrEqual": lambda v: hi >= v,
            "LessThan": lambda v: lo < v,
            "LessThanOrEqual": lambda v: lo <= v,
        }
        return all(checks[op](v) for op, v in self.doc_id_preds)

    def _part_files(self) -> list[str]:
        """A Spark-written table is a DIRECTORY of part files; a flat
        fixture is one file.  Plan over whichever shape we were given."""
        import os

        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".parquet")
            )
            if not files:
                # loud, like the streaming twin: a directory with no
                # top-level part files (empty dir, mistyped path, or a
                # partitionBy-nested layout this reader doesn't walk)
                # must not plan an empty scan and silently read 0 rows
                raise FileNotFoundError(
                    f"no parquet part files directly under {self.path}"
                )
            return files
        return [self.path]

    def partitions(self):
        import pyarrow.parquet as pq

        kept: list[tuple[str, int, int]] = []  # (file, rg index, rows)
        for file in self._part_files():
            md = pq.ParquetFile(file).metadata
            if md.num_row_groups == 0:
                # a zero-row-group file is valid parquet (e.g. an empty
                # write); probing row_group(0) would raise at planning
                continue
            doc_id_idx = next(
                i
                for i in range(md.row_group(0).num_columns)
                if md.row_group(0).column(i).path_in_schema == "doc_id"
            )
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                stats = rg.column(doc_id_idx).statistics
                if (
                    stats is not None
                    and stats.has_min_max
                    and not self._rg_may_match(stats.min, stats.max)
                ):
                    continue  # statistics prove no row here can match
                kept.append((file, g, rg.num_rows))
        # split surviving row groups into ~n_parts ranges; each range stays
        # inside ONE row group of ONE file, so a partition's read cost is
        # bounded by the row-group size regardless of table size
        total = sum(n for _, _, n in kept)
        step = max(1, (total + self.n_parts - 1) // self.n_parts)
        parts = [
            _Range(file, g, s, min(s + step, n))
            for file, g, n in kept
            for s in range(0, n, step)
        ]
        return parts or [_Range(None, 0, 0, 0)]  # all pruned: one empty read

    def read(self, partition: _Range):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if partition.end == partition.start:
            return
        table = pq.ParquetFile(partition.file).read_row_group(
            partition.rg, columns=_COLUMNS
        )
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
