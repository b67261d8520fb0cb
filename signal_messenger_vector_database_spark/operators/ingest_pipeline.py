"""The reference's end-to-end ingest pipeline as one composable operator.

Reference dataflow (SURVEY §3.1, src/signal/receive.rs ->
process_incoming_message.rs -> rag/dataframes.rs -> rag/sqlx.rs):

    message -> format/dispatch (P1/P2) -> suppression filter (F1) ->
    tokenize (T1) -> chunk if > 512 tokens (F4/T3) -> embed (E1) ->
    append to `embeddings` (K1)

Here the whole thing is a single DataFrame transformation usable
identically from batch and from ``foreachBatch`` (the reference shares its
operators between the live stream and the history read path the same way —
SURVEY §3.3).  Everything is JVM-side except the embed stage.

Output schema == the reference's ``embeddings`` table
(src/rag/sqlx.rs:32-51, schemas.EMBEDDINGS_SCHEMA), with the documented
deviations: ``id`` is ``monotonically_increasing_id()`` (unique, not dense
— Spark has no bigserial) and chunk rows carry the *chunk's* text/tokens
(the reference's full-body duplication is a bug, SURVEY T5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .chunking import IDEAL_TOKEN_SIZE, chunk_text
from .embed import with_embeddings
from .suppression import filter_control_messages


def ingest_pipeline(
    messages: DataFrame,
    body_col: str = "body",
    embedding_dim: int = 64,
    ideal_token_size: int = IDEAL_TOKEN_SIZE,
    embedder_factory=None,
    embed_partitions: int | None = None,
) -> DataFrame:
    """message-log rows -> embeddings-table rows.

    ``messages`` must carry ``direction``, ``contact``, ``group_name``,
    ``attachments`` columns (extra columns are dropped); see
    schemas.MESSAGE_LOG_SCHEMA.
    """
    filtered = filter_control_messages(messages, body_col=body_col)  # F1
    chunked = chunk_text(filtered, text_col=body_col, ideal_token_size=ideal_token_size)
    staged = chunked.select(
        F.col("chunk_text").alias("body"),
        F.col("direction"),
        F.col("contact"),
        F.col("group_name"),
        F.col("attachments"),
        F.col("chunk_tokens").alias("tokens"),
    )
    if embed_partitions:
        staged = staged.repartition(embed_partitions)
    embedded = with_embeddings(
        staged,
        text_col="body",
        out_col="embedding",
        dim=embedding_dim,
        embedder_factory=embedder_factory,
    )
    return embedded.select(
        F.monotonically_increasing_id().alias("id"),
        "body",
        "direction",
        "contact",
        "group_name",
        "attachments",
        "tokens",
        "embedding",
        F.current_timestamp().alias("created_at"),
    )
