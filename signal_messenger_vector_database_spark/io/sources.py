"""Parquet table loaders for the driver fixtures.

The reference's scans (SURVEY §2.1: S3 full-table scan ``SELECT * FROM
embeddings`` at src/rag/sqlx.rs:84-92, S4/S5 contacts/groups scans, S6 range
scan) all become ``spark.read.parquet`` here — Catalyst gets predicate
pushdown and column pruning for free, which the reference's ``SELECT *``
never had.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    # Pin timestamp semantics to UTC so filters/renders agree with the
    # DuckDB oracle's naive timestamps regardless of the caller's session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet INT64 TIMESTAMP(NANOS), which Spark rejects
        # by default.  Read nanos as long, then truncate ns -> us exactly
        # like DuckDB does when it surfaces the column as TIMESTAMP.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def parquet_row_count(sf_dir: str, name: str) -> int:
    """Exact table row count from parquet FOOTER metadata — no Spark job,
    no data pages read.

    Plan-building code that needs the corpus size to pick a knob (semdedup
    cluster count, LSH geometry) must not run a ``df.count()`` action: that
    launches a full scan job during plan CONSTRUCTION, violating the repo's
    'a plan must build without running a job' rule (r2 VERDICT task 8;
    ADVICE r7).  Parquet stores ``num_rows`` in every file footer, so the
    count costs one footer read per file — the same metadata the Python
    data source planner (io/pydatasource.py) already relies on.  Handles
    both single-file fixtures and directory-shaped (multi-part) tables.
    """
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        files = [path]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TESTDATA_TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark, sf_dir: str, tables=None) -> None:
    """Expose the testdata tables as temp views so users can drive the
    engine through plain ``spark.sql`` — the same surface the DuckDB
    oracle gets.  Views are lazy: registration costs nothing until a
    query scans one, and Catalyst sees straight through them (pushdown /
    pruning behave exactly as with the DataFrame API)."""
    from ..schemas import TESTDATA_TABLES

    for t in tables or TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def ensure_parallelism(df: "DataFrame") -> "DataFrame":
    """Repartition UP to the session's default parallelism when the
    frame has fewer partitions — never down.

    Why: the fixture parquet is one small file, so a frame read from it
    has ONE input partition and every row-local heavy projection
    downstream (the dyadic md5 corpus builders, the PQ codeword
    scoring, exact ground-truth scans) serializes on a single core of
    local[32] — measured r12: the 3-round trained-PQ build over the
    sf0.1 corpus drops 11.5 s → 2.4 s once spread across the cores.
    At 100 TB inputs arrive in thousands of partitions, so the guard
    makes this a no-op there (coalescing DOWN would be a regression).

    Result safety: repartitioning only changes row placement/order.
    Row-local transforms are unaffected by construction, and every
    aggregate downstream of the call sites is order-free ON THE
    FIXTURES — proven continuously by the cross-engine oracle
    equality (DuckDB sums in a different order than Spark and the
    value hashes match at three scales + hostile), and re-pinned by
    the bit-identical parity checks in test_ivf_index/test_pq_trained.
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
