"""Skew-handling join surfaced as a checkable query.

``operators/scale.py::salted_join`` breaks a hot key into ``salt_buckets``
sub-keys.  The query joins the lineitem fact table to a 3-row dimension on
``l_returnflag`` — a worst-case skew shape (every fact row hits one of 3
keys, so an unsalted shuffle join puts ~1/3 of the table in one task).
Salting spreads each hot key over 8 sub-partitions; the final aggregate
proves the row multiset is identical to the plain join (the oracle joins
without salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_round
from ..io.sources import load_table
from ..operators.scale import salted_join
from .registry import QuerySpec


def _skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = (
        lineitem.select("l_returnflag")
        .distinct()
        .select(
            "l_returnflag",
            F.concat(F.lit("flag:"), F.col("l_returnflag")).alias("flag_label"),
        )
    )
    joined = salted_join(lineitem, dim, on="l_returnflag", salt_buckets=8)
    return joined.groupBy("l_returnflag", "flag_label").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


_SKEW_SALTED_JOIN_SQL = """
SELECT l_returnflag, 'flag:' || l_returnflag AS flag_label,
       COUNT(*) AS n_rows,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY 1, 2
"""


def _upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics via operators/sink.py::merge_upsert: every 10th
    order receives an update (price bump, status flip); the merged table
    must contain exactly one row per key with updates winning."""
    from ..operators.sink import merge_upsert

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
        .withColumn("o_orderstatus", F.lit("U"))
    )
    merged = merge_upsert(orders, updates, key_cols=["o_orderkey"])
    return merged.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.round("o_totalprice", 2).alias("totalprice"),
    )


_UPSERT_LATEST_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE o_orderstatus END AS status,
       ROUND(CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000.0
                  ELSE o_totalprice END, 2) AS totalprice
FROM orders
"""


SPECS: dict[str, QuerySpec] = {
    "skew_salted_join": QuerySpec(
        _skew_salted_join,
        _SKEW_SALTED_JOIN_SQL,
        "salted skew join on a 3-key fact column; multiset equals plain join",
    ),
    "upsert_latest": QuerySpec(
        _upsert_latest,
        _UPSERT_LATEST_SQL,
        "MERGE/upsert: latest-row-per-key over base UNION updates",
    ),
}


def _interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless time-range join done scale-first: bucket binning.

    "Count clicks (from ANY user) within 15 minutes after each signup" has
    no equi-key, so a naive formulation is a BroadcastNestedLoopJoin /
    cartesian range filter — quadratic at 100 TB.  The bin trick restores
    an equi-join: clicks carry their 15-minute epoch bucket; each signup
    explodes to its own and the next bucket (a [t, t+15min) window spans
    at most two buckets); the join key is the bucket, and the exact range
    predicate filters the small in-bucket candidate set.  A click's single
    bucket matches exactly one of the signup's two distinct buckets, so no
    post-join dedup is needed.  Shuffle volume is O(rows), and bucket
    width tunes the candidate fan-in (width ~ window size is optimal).
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = lambda c: F.floor(F.unix_timestamp(c) / 900)  # noqa: E731
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("c_ts"), bucket(F.col("ts")).alias("bkt")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_id"),
        F.col("ts").alias("s_ts"),
        F.explode(
            F.array(bucket(F.col("ts")), bucket(F.col("ts")) + 1)
        ).alias("bkt"),
    )
    return (
        signups.join(clicks, "bkt")
        .filter(
            (F.col("c_ts") >= F.col("s_ts"))
            & (F.col("c_ts") < F.col("s_ts") + F.expr("INTERVAL 15 MINUTES"))
        )
        .groupBy("s_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )


_INTERVAL_JOIN_BINNED_SQL = """
SELECT s.event_id AS s_id, CAST(COUNT(*) AS BIGINT) AS n_clicks
FROM (SELECT event_id, ts FROM events WHERE event_type = 'signup') s
JOIN (SELECT ts FROM events WHERE event_type = 'click') c
  ON c.ts >= s.ts AND c.ts < s.ts + INTERVAL 15 MINUTE
GROUP BY s.event_id
"""


SPECS["interval_join_binned"] = QuerySpec(
    _interval_join_binned,
    _INTERVAL_JOIN_BINNED_SQL,
    "keyless range join via 15-min bucket binning (equi-join, no NLJ)",
)


def _range_partition_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth range-partition boundaries — the planning query behind
    ``repartitionByRange`` / Spark's RangePartitioner: 31 interior
    quantiles of the sort key split the table into 32 balanced ranges.
    Exact interpolated percentiles here (one aggregate pass); at 100 TB
    swap in ``approx_percentile`` (t-digest) with identical plan shape —
    boundary precision only shifts a few rows between partitions."""
    li = load_table(spark, sf_dir, "lineitem")
    fracs = ", ".join(str(i / 32.0) for i in range(1, 32))
    return (
        li.agg(
            F.expr(f"percentile(l_extendedprice, array({fracs}))").alias("bounds")
        )
        .select(F.posexplode("bounds").alias("idx", "bound"))
        .select(
            (F.col("idx") + 1).alias("bound_idx"),
            portable_round(F.col("bound"), 2).alias("bound"),
        )
    )


_RANGE_BOUNDS_SQL = f"""
WITH q AS (
  SELECT quantile_cont(l_extendedprice,
         [{", ".join(str(i / 32.0) for i in range(1, 32))}]) AS bounds
  FROM lineitem
)
SELECT u.i AS bound_idx, FLOOR(u.b * 100 + 0.5) / 100 AS bound
FROM (SELECT unnest(list_transform(bounds,
             (x, i) -> struct_pack(i := i, b := x))) AS u FROM q)
"""


SPECS["range_partition_bounds"] = QuerySpec(
    _range_partition_bounds,
    _RANGE_BOUNDS_SQL,
    "equi-depth range-partition boundaries (RangePartitioner planning query)",
)


def _zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key: interleave the bits of two join/
    filter dimensions so that sorting by ONE key co-locates rows that are
    close in BOTH.  Writing a 100 TB table sorted by this key makes
    parquet row-group min/max stats selective for filters on either
    dimension (the mechanism behind Delta/Iceberg Z-ORDER BY — here as a
    plain column expression, usable with sortWithinPartitions +
    repartitionByRange today).  Pure integer bit arithmetic, identical in
    both engines; 8 bits per dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    a, b = "(l_partkey % 256)", "(l_suppkey % 256)"
    interleave = " + ".join(
        f"((({a} >> {i}) & 1) << {2 * i}) + ((({b} >> {i}) & 1) << {2 * i + 1})"
        for i in range(8)
    )
    return (
        li.selectExpr(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            f"CAST({interleave} AS BIGINT) AS zkey",
        )
        .orderBy("zkey", "l_orderkey", "l_linenumber")
        .limit(100)
    )


def _zorder_key_sql() -> str:
    a, b = "(l_partkey % 256)", "(l_suppkey % 256)"
    interleave = " + ".join(
        f"((({a} >> {i}) & 1) << {2 * i}) + ((({b} >> {i}) & 1) << {2 * i + 1})"
        for i in range(8)
    )
    return f"""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       CAST({interleave} AS BIGINT) AS zkey
FROM lineitem
ORDER BY zkey, l_orderkey, l_linenumber
LIMIT 100
"""


SPECS["zorder_key"] = QuerySpec(
    _zorder_key,
    _zorder_key_sql(),
    "Morton/Z-order clustering key via bit interleaving (multi-dim file skipping)",
)


# --- runtime bloom-filter prefiltered join -------------------------------
# The third runtime-filtering mechanism next to static partition pruning
# and DPP (both pinned in test_scale): Spark injects a bloom filter built
# from the SELECTIVE (filtered-dim) side of a shuffle join into the fact
# scan, so fact rows that cannot match are dropped BEFORE the exchange —
# at 100 TB this cuts shuffle volume by the join selectivity without any
# manual prefilter.  Fixture-scale size thresholds would never trigger
# the rewrite, so the query runs on a cloned session with the
# application-side floor lowered; the result is semantically identical
# to the plain join (which is exactly what the oracle replays).


def _bloom_prefiltered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    # keep the filtered dim side above the broadcast path so the join
    # actually shuffles (a broadcast join needs no runtime filter)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = load_table(s, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    lineitem = load_table(s, sf_dir, "lineitem")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


_BLOOM_PREFILTERED_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderpriority
"""


SPECS["bloom_prefiltered_join"] = QuerySpec(
    _bloom_prefiltered_join,
    _BLOOM_PREFILTERED_JOIN_SQL,
    "runtime bloom filter from the selective join side injected into the fact scan",
)
