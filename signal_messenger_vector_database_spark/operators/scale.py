"""Scale mechanics: bucketed co-located joins and salted skew joins.

These are the two shuffle-control tools that matter most at 100 TB and
that no fixture-size benchmark shows off on its own:

- **Bucketing** pre-shuffles a table ONCE at write time (`bucketBy` on the
  join key).  Every later join/aggregation on that key reads co-located
  buckets and skips the exchange entirely — the plan literally contains no
  Exchange on the bucketed sides (asserted in tests/test_scale.py).
- **Salting** breaks a hot key into `salt_buckets` sub-keys: the skewed
  fact side gets a random salt, the small side is exploded across all salt
  values, and the join key becomes (key, salt).  Complements AQE's
  skew-join splitting (which handles skewed *partitions*, not a single
  giant key landing in one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Materialize a table bucketed (and optionally sorted) by the join
    key.  At 100 TB this is the one-time cost that removes the shuffle
    from every subsequent join on that key."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two tables bucketed on the same key: no Exchange on either
    side (SortMergeJoin reads bucket files directly)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``fact`` has skewed keys: salt the fact side,
    replicate the dim side across all salts, join on (key, salt).

    The dim side is replicated ``salt_buckets`` times — use only when dim
    is small relative to the skew being broken."""
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed) * salt_buckets).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_fact.join(salted_dim, [on, "_salt"])
    return out.drop("_salt")
