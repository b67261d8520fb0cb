"""SparkSession factory used by tests and bench.

The driver supplies its own session to ``__spark_entry__``; this factory is
for local runs.  Config choices are scale-oriented defaults:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing);
- Arrow on (every pandas UDF / mapInPandas crossing is Arrow-batched);
- UTC session timezone so timestamp semantics match the DuckDB oracle;
- shuffle partitions sized to the local core count (on a real cluster this
  is ``spark.sql.adaptive.coalescePartitions`` + a larger initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "smvd-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    parts = str(shuffle_partitions or cpus)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
