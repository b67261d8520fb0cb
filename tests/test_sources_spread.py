"""ensure_parallelism must decide the spread from FILE METADATA, never
``df.rdd`` (VERDICT r12 #7 / ADVICE r12): the old probe forced an extra
physical-planning pass per plan-build call and raises under Spark
Connect.  These tests pin the new contract: fixture-sized parquet still
spreads (bit-identical results), non-file frames and failure modes are
no-ops, and no RDD surface is touched while deciding."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_fixture_parquet_spreads_to_default_parallelism(spark):
    from signal_messenger_vector_database_spark.io.sources import (
        ensure_parallelism,
        load_table,
    )

    emb = load_table(spark, SF, "embeddings")
    spread = ensure_parallelism(emb)
    par = spark.sparkContext.defaultParallelism
    # the fixture is one small single-row-group file: the spread fires
    assert spread.rdd.getNumPartitions() == par
    # ... and is row-identical (placement-only change)
    base = {r.vec_id for r in emb.select("vec_id").collect()}
    assert {r.vec_id for r in spread.select("vec_id").collect()} == base


def test_non_file_frame_is_untouched(spark):
    from signal_messenger_vector_database_spark.io.sources import (
        ensure_parallelism,
    )

    df = spark.range(10)
    assert ensure_parallelism(df) is df


def test_decision_never_touches_rdd_surface(spark, monkeypatch):
    """The whole point of the rewrite: plan-build must not pay (or
    require) DataFrame->RDD conversion.  Poison .rdd and decide."""
    from signal_messenger_vector_database_spark.io.sources import (
        ensure_parallelism,
        load_table,
    )

    def boom(self):  # pragma: no cover - must never run
        raise AssertionError("ensure_parallelism touched df.rdd")

    emb = load_table(spark, SF, "embeddings")
    # poison the CONCRETE class (pyspark 4: pyspark.sql.classic...) —
    # patching the abstract base would never fire
    monkeypatch.setattr(type(emb), "rdd", property(boom))
    spread = ensure_parallelism(emb)  # must not raise
    assert spread is not emb  # fixture input: the spread fired


def test_object_store_like_uri_is_noop(spark, monkeypatch):
    """A non-local scheme means cluster-scale input: never spread."""
    from signal_messenger_vector_database_spark.io.sources import (
        ensure_parallelism,
        load_table,
    )

    emb = load_table(spark, SF, "embeddings")
    # patch the CONCRETE class (pyspark 4: pyspark.sql.classic...), not
    # the abstract pyspark.sql.DataFrame base
    monkeypatch.setattr(
        type(emb), "inputFiles", lambda self: ["s3a://bucket/part-0.parquet"]
    )
    assert ensure_parallelism(emb) is emb


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("134217728", 134217728),
        ("134217728b", 134217728),
        ("128m", 128 * 1024**2),
        ("128MB", 128 * 1024**2),
        ("4k", 4096),
        (" 1g ", 1024**3),
        (7, 7),
    ],
)
def test_parse_bytes(raw, expected):
    from signal_messenger_vector_database_spark.io.sources import _parse_bytes

    assert _parse_bytes(raw) == expected
