"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``signal_messenger_vector_database_spark.plans.catalog``:
each ``queries()`` entry is an implemented operator from SURVEY.md §2 (or a
north-star LLM-pipeline operator), and ``oracle_sql()`` carries the
equivalent DuckDB SQL for the hash-compare at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from signal_messenger_vector_database_spark.plans.catalog import all_specs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's RAG retrieval path, end-to-end —
    question (src/rag/questions.rs:1-5, hardcoded and never wired) ->
    deterministic embed -> cosine top-k over the vector table (the
    pgvector capability declared at src/rag/sqlx.rs:22-42 but never
    implemented) -> ordered context -> llama3 prompt render
    (src/rag/prompt_template.rs:10-26, never called in the reference).
    Fully oracle-paired despite the Python embedder: the query vector is
    computed driver-side and inlined as a literal in both engines."""
    return all_specs()["rag_retrieve"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    from signal_messenger_vector_database_spark.plans.registry import (
        resolve_oracle,
    )

    return {
        name: sql
        for name, spec in all_specs().items()
        if (sql := resolve_oracle(name, spec)) is not None
    }
