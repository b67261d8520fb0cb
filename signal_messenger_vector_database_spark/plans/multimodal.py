"""Multimodal query surface: binary payload columns + metadata (oracle-
paired) and the stubbed decode/featurize/frame-sample stages (rows-only;
the container has no image/audio libs — see operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sources import load_table
from ..operators.multimodal import attach_binary, extract_features, sample_frames
from .registry import QuerySpec


def _multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_bin = attach_binary(docs, text_col="text")
    return with_bin.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


_MULTIMODAL_METADATA_SQL = """
SELECT doc_id, 'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum
FROM documents
"""


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_binary(docs).repartition(8), payload_col="payload")
    return feats.select(
        "doc_id",
        F.size("features").alias("n_bins"),
        F.round(
            F.aggregate(
                F.col("features").cast("array<double>"), F.lit(0.0), lambda a, x: a + x
            ),
            3,
        ).alias("hist_mass"),
    )


def _multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_binary(docs).repartition(8))
    return frames.select(
        "doc_id", "frame_id", F.length("frame_bytes").alias("frame_len"), "frame_note"
    )


SPECS: dict[str, QuerySpec] = {
    "multimodal_metadata": QuerySpec(_multimodal_metadata, _MULTIMODAL_METADATA_SQL, "binary payload + typed metadata struct"),
    "multimodal_features": QuerySpec(_multimodal_features, None, "stubbed decode->featurize over binary (mapInPandas)"),
    "multimodal_frames": QuerySpec(_multimodal_frames, None, "1->N frame sampling over binary payloads"),
}
