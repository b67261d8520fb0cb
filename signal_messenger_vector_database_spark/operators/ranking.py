"""Tie-aware global ranking without a global window.

``Window.orderBy`` with no partitionBy funnels the whole table through ONE
task — the canonical Spark scale-killer for rank/dense_rank/cume_dist/
ntile.  This operator generalizes the two-pass bucket + offset shape used
by the rank-family queries (plans/analytics.py) so any plan — and the
property fuzzer in tests/test_properties.py — can rank globally at scale:

1. each row gets a bucket id that is a PURE FUNCTION of its ordering-key
   value (monotone in it, so equal keys share a bucket and bucket order
   respects key order) — nothing depends on physical partition ids or
   exchange reuse (round-6 ADVICE);
2. local row_number / rank / dense_rank run per bucket, in parallel;
3. the per-bucket count table (rows + distinct keys) is prefix-summed —
   the ONLY single-task stage, over |buckets| rows — and broadcast back:
   global rank = row-offset + local rank, global dense_rank =
   distinct-offset + local dense_rank, cume_dist = (row-offset + tie-group
   max row_number)/n, ntile(k) closed-form over the tie-broken row number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_rank_family(
    df: DataFrame,
    order_col: str,
    id_col: str,
    bucket: Column,
    ntiles: int = 4,
    round_cd: int = 4,
) -> DataFrame:
    """Global ``rk``/``drk``/``cd``/``quartile`` over ``order_col`` ASC
    (ties allowed; ``id_col`` is the unique row_number tiebreak), with
    ``bucket`` a monotone pure function of the ``order_col`` VALUE."""
    w_bucket = Window.partitionBy("_pid")
    local = (
        df.select(id_col, order_col, bucket.alias("_pid"))
        .withColumn(
            "_lrn", F.row_number().over(w_bucket.orderBy(order_col, id_col))
        )
        .withColumn("_lrk", F.rank().over(w_bucket.orderBy(order_col)))
        .withColumn("_ldrk", F.dense_rank().over(w_bucket.orderBy(order_col)))
        .withColumn(
            "_tie_max_rn",
            F.max("_lrn").over(Window.partitionBy("_pid", order_col)),
        )
    )
    counts = local.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(order_col).alias("_nd"),
    )
    prior = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_n").over(prior), F.lit(0)).alias("_off"),
        F.coalesce(F.sum("_nd").over(prior), F.lit(0)).alias("_doff"),
    )
    total = counts.agg(F.sum("_n").alias("_total"))
    rn = F.col("_off") + F.col("_lrn")
    size = F.floor(F.col("_total") / ntiles)
    rem = F.col("_total") % ntiles
    big = rem * (size + 1)
    quartile = F.when(rn <= big, F.floor((rn - 1) / (size + 1)) + 1).otherwise(
        rem + F.floor((rn - big - 1) / size) + 1
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            (F.col("_off") + F.col("_lrk")).cast("long").alias("rk"),
            (F.col("_doff") + F.col("_ldrk")).cast("long").alias("drk"),
            F.round(
                (F.col("_off") + F.col("_tie_max_rn")).cast("double")
                / F.col("_total"),
                round_cd,
            ).alias("cd"),
            quartile.cast("long").alias("quartile"),
        )
    )


def two_phase_topk(df: DataFrame, key: str, order: list[Column], k: int) -> DataFrame:
    """Partition-local then global top-k per ``key`` — the skew-safe
    top-k-per-group shape: local top-k inside each physical partition
    first (``spark_partition_id`` in the window key), so the global
    per-key window only ever sees <= parallelism * k survivors instead
    of every row of a hot key.  Result is independent of physical
    layout because the local pass only PRUNES rows that cannot be in
    the global top-k (partition-invariance is pinned by tests in both
    consumers).  ONE copy (shared-definition rule): consumed by
    ann_recall_at_k's exact arm and the PQ operating point's shortlist/
    exact arms.  Output keeps the input columns plus ``rk``."""
    w1 = Window.partitionBy(key, "pid").orderBy(*order)
    w2 = Window.partitionBy(key).orderBy(*order)
    local = (
        df.withColumn("pid", F.spark_partition_id())
        .withColumn("rk", F.row_number().over(w1))
        .filter(F.col("rk") <= k)
        .drop("pid", "rk")
    )
    return local.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= k)
