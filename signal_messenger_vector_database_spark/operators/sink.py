"""Sinks: K1 append, K2 DDL bootstrap, K3/P7 attachment-style file naming.

Reference behavior mapped:

- K2 (src/rag/sqlx.rs:9-54): ``CREATE EXTENSION`` + ``CREATE TABLE IF NOT
  EXISTS embeddings`` => idempotent ``CREATE TABLE IF NOT EXISTS ... USING
  PARQUET`` (no extension concept needed — vector math is native here).
- K1 (src/rag/sqlx.rs:56-82): row-at-a-time INSERT loop with swallowed
  errors => one atomic ``df.write.mode("append")`` (and exactly-once via
  foreachBatch + checkpoint in streaming/ingest.py).
- K3/P7 (src/signal/process_incoming_message.rs:46-83): attachment bytes
  written under ``attachments/`` with a ``%Y-%m-%d-%H-%M-%s`` timestamped
  name, mime-guessed extension and collision prefixing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .multimodal import MIME_EXTENSIONS

EMBEDDINGS_DDL_COLS = """
  id BIGINT,
  body STRING,
  direction STRING,
  contact STRING,
  group_name STRING,
  attachments ARRAY<STRING>,
  tokens INT,
  embedding ARRAY<FLOAT>,
  created_at TIMESTAMP
"""


def ensure_embeddings_table(
    spark: SparkSession, name: str = "embeddings_out", location: str | None = None
) -> None:
    """K2: idempotent DDL bootstrap (CREATE TABLE IF NOT EXISTS,
    src/rag/sqlx.rs:32-51)."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({EMBEDDINGS_DDL_COLS}) USING PARQUET{loc}"
    )


def append_embeddings(df: DataFrame, name: str = "embeddings_out") -> None:
    """K1: atomic batch append (vs the reference's per-row INSERT with
    printed-and-swallowed errors, src/rag/sqlx.rs:60-79)."""
    df.write.mode("append").insertInto(name)


def write_compacted(df: DataFrame, path: str, target_files: int = 1) -> None:
    """Small-file compaction: coalesce to a bounded file count before the
    write.  At 100 TB, streaming appends produce file counts that degrade
    every later scan (listing + tiny row groups); periodic compaction with
    ``coalesce`` (no shuffle) is the maintenance op.  Use ``repartition``
    instead when output skew matters more than the extra shuffle."""
    df.coalesce(target_files).write.mode("overwrite").parquet(path)


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    prefer_updates: bool = True,
    version_col: str | None = None,
) -> DataFrame:
    """MERGE/upsert semantics over immutable parquet: latest row per key
    from ``base UNION updates``.

    The reference's sink is append-only (src/rag/sqlx.rs:56-82, no UPDATE
    anywhere), so this is the north-star table-maintenance operator a
    CDC/training pipeline needs: rewrite-on-merge.  One shuffle on the
    key, window ``row_number`` keeps the winner; at 100 TB you combine it
    with partition pruning to rewrite only the partitions that received
    updates."""
    from pyspark.sql import Window

    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    order = [F.col("_src").desc() if prefer_updates else F.col("_src").asc()]
    if version_col is not None:
        # CDC streams carry several updates per key; the version column
        # (sequence number / event time) picks the latest deterministically.
        order.append(F.col(version_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )


def timestamped_filename(
    mime_col: Column | str, file_name_col: Column | str | None = None
) -> Column:
    """P7: ``{%Y-%m-%d-%H-%M-%s}.{ext}`` default name; a provided original
    filename is collision-prefixed with the timestamp
    (src/signal/process_incoming_message.rs:53-69).  The mime -> extension
    map is a literal lookup expression (mime_guess as data, not a UDF)."""
    mime = F.col(mime_col) if isinstance(mime_col, str) else mime_col
    ext = F.lit("bin")
    for m, e in MIME_EXTENSIONS.items():
        ext = F.when(mime == m, F.lit(e)).otherwise(ext)
    stamp = F.concat(
        F.date_format(F.current_timestamp(), "yyyy-MM-dd-HH-mm"),
        F.lit("-"),
        F.unix_timestamp(F.current_timestamp()).cast("string"),
    )
    default_name = F.concat(stamp, F.lit("."), ext)
    if file_name_col is None:
        return default_name
    provided = F.col(file_name_col) if isinstance(file_name_col, str) else file_name_col
    return F.when(provided.isNull() | (provided == default_name), default_name).otherwise(
        F.concat(stamp, F.lit("-"), provided)
    )
