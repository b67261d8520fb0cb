"""PySpark-native analytics engine with the query and data-processing
capabilities of danielclough/signal-messenger-vector-database.

The reference (Rust, see SURVEY.md) is a RAG-ingest pipeline: stream Signal
messages -> filter control traffic -> enrich via contact/group lookups ->
tokenize -> chunk -> embed -> append to a Postgres+pgvector table, with a
declared-but-unshipped vector retrieval surface.  This package re-expresses
that operator inventory Spark-first (DataFrame/SQL/Catalyst/Structured
Streaming) and extends it with the LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) a 100 TB training-data
pipeline needs.
"""

__version__ = "0.1.0"
