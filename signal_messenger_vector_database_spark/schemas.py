"""Schema constants.

``EMBEDDINGS_SCHEMA`` mirrors the reference's one persistent table
(``CREATE TABLE embeddings``, reference src/rag/sqlx.rs:32-51) with the
*intended* types: ``attachments`` is array<string> (the Rust struct binds
``Option<Vec<String>>``, src/rag/dataframes.rs:12, even though the SQL DDL
said ``text`` — a reference bug documented in SURVEY §1.2).

``MESSAGE_LOG_SCHEMA`` mirrors the in-flight record ``ProcessedMessage``
(reference src/signal/process_incoming_message.rs:18-26) plus an event-time
column, i.e. the input row shape of the ingest pipeline.

Schemas are fixed/DDL-declared like the reference — no inference.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Embedding dimensionality is a pipeline parameter, NOT baked into the schema
# (the reference hardcodes VECTOR(768) for nomic-embed-text,
# src/rag/sqlx.rs:42; the driver fixtures use 64-d).
DEFAULT_EMBEDDING_DIM = 768
# Dimensionality of /root/testdata/*/embeddings.parquet (TESTDATA.md).
# Plan builders read THIS, never the data: a query must construct without
# touching rows (r2 VERDICT task 8).
FIXTURE_EMBEDDING_DIM = 64

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("body", StringType(), True),
        StructField("direction", StringType(), True),  # 'to' | 'from'
        StructField("contact", StringType(), True),  # "Name,uuid" or bare uuid
        StructField("group_name", StringType(), True),
        StructField("attachments", ArrayType(StringType()), True),
        StructField("tokens", IntegerType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("created_at", TimestampType(), False),
    ]
)

MESSAGE_LOG_SCHEMA = StructType(
    [
        StructField("direction", StringType(), True),  # 'to' | 'from'
        StructField("contact", StringType(), True),
        StructField("sender", StringType(), True),
        StructField("group_name", StringType(), True),
        StructField("body", StringType(), True),
        StructField("attachments", ArrayType(StringType()), True),
        StructField("ts", TimestampType(), True),
    ]
)

# Driver-provided fixture tables (FIXTURES.md): TPC-H-ish star schema +
# events stream table + documents/embeddings vector tables.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
