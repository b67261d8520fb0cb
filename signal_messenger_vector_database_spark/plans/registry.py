"""Query catalog registry.

Each implemented operator from SURVEY.md §2 is registered as a
``QuerySpec``: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, when
the semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle query
over the same parquet tables.  The driver hash-compares the two at sf0.01
(CORRECTNESS_r{N}.json).

Determinism rules every paired query follows (so the order-insensitive
value-hash matches across engines):

- every computed float is ``ROUND``ed identically on both sides (money: 2,
  ratios/similarities: 4) — parallel summation order differs between
  engines at ulp level;
- DuckDB integer sums are CAST to BIGINT (DuckDB widens to HUGEINT);
- timestamps are rendered to strings with matching format patterns
  (sessions pinned to UTC by the loader);
- any LIMIT/top-k is fully tie-broken by a key column, ordered by the
  *rounded* measure.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    description: str = ""
