"""OLAP surface wave 2: the aggregation/join shapes a 100 TB warehouse
runs daily, each oracle-paired.

Why these matter at scale (SURVEY §2.8-§2.9 notes that the reference has
no aggregation surface at all — this is the north-star analytics layer):

- q6/q19: selective scans where the WHOLE predicate must reach the
  parquet reader (PushedFilters) — at 100 TB the difference between
  scanning 1% and 100% of row groups.
- q14/q16: fact-dim joins where the dim side is broadcast and the
  distinct-agg is planned as two-phase (partial per partition, final
  after one shuffle).
- cube/grouping sets: Expand-based multi-grouping — one scan feeding
  N grouping combinations instead of N scans.
- percentiles: exact linear-interpolation quantiles; at scale you'd
  swap to approx_percentile (t-digest) — both surfaced.
- RANGE-frame window: time-range running aggregates without a
  self-join (the naive formulation is O(n^2)).
- null-safe join: `<=>` keeps a single hash join where `=` plus
  OR-IS-NULL would force a nested loop.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_round
from ..io.sources import load_table
from .registry import QuerySpec


# --- TPC-H Q6 shape: forecast revenue change (pure pushdown scan) -------
def _q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue_delta"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_delta,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# --- TPC-H Q14 shape: promo revenue share -------------------------------
def _q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
    total = F.sum(rev)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01"))
            & (F.col("l_shipdate") < F.lit("1996-10-01"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(promo, 2).alias("promo_revenue"),
            F.round(total, 2).alias("total_revenue"),
            portable_round(promo / total, 4).alias("promo_share"),
        )
    )


_Q14_SQL = """
SELECT ROUND(SUM(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2)
         AS promo_revenue,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
       FLOOR((SUM(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
              / SUM(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000
         AS promo_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


# --- TPC-H Q16 shape: supplier variety (distinct-agg under exclusions) --
def _q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(
            (F.col("p_brand") != "Brand#19")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .join(lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#19'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
GROUP BY p_brand, p_type, p_size
"""


# --- TPC-H Q19 shape: disjunctive bracket predicates --------------------
def _q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bracket = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        lineitem.join(
            F.broadcast(part), (F.col("l_partkey") == F.col("p_partkey")) & bracket
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q19_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
 AND ((p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30))
"""


# --- CUBE: all grouping combinations in one Expand pass -----------------
def _cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --- GROUPING SETS via the SQL surface ----------------------------------
def _grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = f"lineitem_gs_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               COUNT(*) AS n_rows
        FROM {view}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_extendedprice), 2) AS sum_price,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


# --- exact percentiles (linear interpolation) per group -----------------
def _percentile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles without per-group value buffering.

    Spark's ``percentile()`` aggregate holds every group value in one
    aggregation buffer — ~n/3 doubles on a single executor here, which
    is the quiet OOM at 100 TB (the scaling probe surfaced it as the
    one wave-7 query whose cost tracked raw row count).  Instead:
    reduce to the per-(flag, price) VALUE HISTOGRAM — bounded by the
    price domain's cardinality, not the corpus — then a running-count
    window over histogram rows locates the order statistics and the
    standard type-7 interpolation lo + frac*(hi-lo) reproduces
    percentile()/quantile_cont bit-for-bit (same doubles, same formula),
    so the DuckDB oracle is unchanged."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").alias("v")
    )
    hist = li.groupBy("l_returnflag", "v").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("l_returnflag").orderBy("v")
    cum = hist.withColumn("cum", F.sum("c").over(w))
    n_tbl = hist.groupBy("l_returnflag").agg(F.sum("c").alias("n"))
    j = cum.join(n_tbl, "l_returnflag")

    def lo_hi(p: float, tag: str):
        # h references the per-row (per-group-constant) n, so the order-
        # statistic conditions are row-level and legal inside the aggs
        h = (F.col("n") - 1) * F.lit(p)
        return [
            F.min(F.when(F.col("cum") >= F.floor(h) + 1, F.col("v"))).alias(
                f"_lo{tag}"
            ),
            F.min(F.when(F.col("cum") >= F.ceil(h) + 1, F.col("v"))).alias(
                f"_hi{tag}"
            ),
        ]

    agg = j.groupBy("l_returnflag").agg(
        F.first("n").alias("n"),
        *lo_hi(0.25, "25"),
        *lo_hi(0.5, "50"),
        *lo_hi(0.75, "75"),
    )

    def interp(p: float, tag: str):
        # Mirror DuckDB's quantile_cont arithmetic EXACTLY:
        # lo*(1-frac) + hi*frac — the algebraically equal lo+frac*(hi-lo)
        # differs in the last ulp (81364.255 vs 81364.25499999999 at
        # sf0.001) and that ulp decides the .xx5 rounding boundary.  And
        # portable_round, not F.round: the interpolated value itself
        # lands on such boundaries (raw p50 52724.244999999995 — Spark
        # ROUND gives .24 off the binary expansion, DuckDB .25 off the
        # shortest decimal; latent since r2, exposed by the sf0.001
        # sweep)
        h = (F.col("n") - 1) * F.lit(p)
        frac = h - F.floor(h)
        return portable_round(
            F.col(f"_lo{tag}") * (F.lit(1.0) - frac) + F.col(f"_hi{tag}") * frac,
            2,
        )

    return agg.select(
        "l_returnflag",
        interp(0.25, "25").alias("p25"),
        interp(0.5, "50").alias("p50"),
        interp(0.75, "75").alias("p75"),
        F.col("n").cast("long").alias("n_rows"),
    )


_PERCENTILE_SQL = """
SELECT l_returnflag,
       FLOOR(quantile_cont(l_extendedprice, 0.25) * 100 + 0.5) / 100 AS p25,
       FLOOR(quantile_cont(l_extendedprice, 0.5)  * 100 + 0.5) / 100 AS p50,
       FLOOR(quantile_cont(l_extendedprice, 0.75) * 100 + 0.5) / 100 AS p75,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


# --- RANGE-frame window: per-user 1-hour running sum --------------------
# Timestamps floored to whole epoch seconds on both engines; the summed
# measure is cast to DECIMAL so the windowed sum is exact (bit-identical)
# rather than order-of-addition-dependent double arithmetic.
def _window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts").alias("sec")
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        events.select(
            "event_id", "user_id", sec, F.col("value").cast("decimal(18,6)").alias("v")
        )
        .select(
            "event_id",
            "user_id",
            "sec",
            F.round(F.sum("v").over(w), 2).cast("double").alias("hour_sum"),
        )
    )


_RANGE_FRAME_SQL = """
SELECT event_id, user_id,
       CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) OVER (
           PARTITION BY user_id
           ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
         AS hour_sum
FROM events
"""


# --- null-safe equi-join (`<=>` stays a hash join) ----------------------
def _nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # Derive a nullable key: 'click' -> NULL on side a, 'view' -> NULL on
    # side b, so the NULL groups must pair up under null-safe equality.
    a = (
        events.groupBy(F.nullif(F.col("event_type"), F.lit("click")).alias("k"))
        .agg(F.count(F.lit(1)).alias("a_cnt"))
    )
    b = (
        events.groupBy(F.nullif(F.col("event_type"), F.lit("view")).alias("k"))
        .agg(F.count(F.lit(1)).alias("b_cnt"))
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]))
        .select(
            F.coalesce(a["k"], F.lit("<null>")).alias("key"), "a_cnt", "b_cnt"
        )
    )


_NULLSAFE_SQL = """
WITH a AS (
  SELECT nullif(event_type, 'click') AS k, COUNT(*) AS a_cnt
  FROM events GROUP BY 1
), b AS (
  SELECT nullif(event_type, 'view') AS k, COUNT(*) AS b_cnt
  FROM events GROUP BY 1
)
SELECT COALESCE(a.k, '<null>') AS key, a_cnt, b_cnt
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
"""


# --- fixed-width histogram over order totals ----------------------------
def _price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(50000.0)), F.lit(9)
    ).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


_HISTOGRAM_SQL = """
SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi
FROM orders
GROUP BY 1
"""


SPECS: dict[str, QuerySpec] = {
    "q6_revenue_delta": QuerySpec(
        _q6_revenue_delta, _Q6_SQL, "TPC-H Q6 shape: fully-pushed selective scan + agg"
    ),
    "q14_promo_effect": QuerySpec(
        _q14_promo_effect, _Q14_SQL, "TPC-H Q14 shape: broadcast dim join + conditional agg ratio"
    ),
    "q16_supplier_variety": QuerySpec(
        _q16_supplier_variety, _Q16_SQL, "TPC-H Q16 shape: distinct-agg under exclusion filters"
    ),
    "q19_bracket_revenue": QuerySpec(
        _q19_bracket_revenue, _Q19_SQL, "TPC-H Q19 shape: disjunctive join predicates"
    ),
    "cube_agg": QuerySpec(_cube_agg, _CUBE_SQL, "CUBE multi-grouping via one Expand pass"),
    "grouping_sets_agg": QuerySpec(
        _grouping_sets_agg, _GROUPING_SETS_SQL, "GROUPING SETS via the SQL surface"
    ),
    "percentile_summary": QuerySpec(
        _percentile_summary, _PERCENTILE_SQL, "exact interpolated percentiles per group"
    ),
    "window_range_frame": QuerySpec(
        _window_range_frame, _RANGE_FRAME_SQL, "time-RANGE window frame running sum (exact DECIMAL)"
    ),
    "nullsafe_join": QuerySpec(
        _nullsafe_join, _NULLSAFE_SQL, "null-safe equi-join (<=> stays a hash join)"
    ),
    "price_histogram": QuerySpec(
        _price_histogram, _HISTOGRAM_SQL, "fixed-width histogram bucketing"
    ),
}


# --- SCD2 validity intervals (slowly-changing dimension build) -----------
# Event log -> type-2 dimension: per user, collapse consecutive rows with
# the same state (event_type), then derive [valid_from, valid_to) from
# lead(); the open row (valid_to IS NULL) is current.  Two windows over
# the same (user_id, ts) ordering => ONE shuffle on user_id serves both
# (Spark reuses the sort); at scale this is the standard CDC-compaction
# shape: no self-joins, no collect.


def _scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.select("user_id", "ts", "event_id", F.col("event_type").alias("state"))
        .withColumn("prev_state", F.lag("state").over(w))
        .filter(
            F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


_SCD2_INTERVALS_SQL = """
WITH changes AS (
  SELECT user_id, ts, event_id, event_type AS state,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
  FROM events
)
SELECT user_id, state,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM changes
WHERE prev_state IS NULL OR state <> prev_state
"""

SPECS["scd2_intervals"] = QuerySpec(
    _scd2_intervals,
    _SCD2_INTERVALS_SQL,
    "SCD2 dimension build: change-compaction + lead() validity intervals",
)


# --- per-user EWMA (exponentially-weighted moving average) ---------------
# EWMA is inherently sequential (acc = a*x + (1-a)*acc), which SQL windows
# can't express directly; the distributed shape is: one shuffle to gather
# each user's series as an ORDERED array, then a per-row JVM fold.  State
# is O(events-per-user) — bounded per key, never global.  DuckDB's
# list_reduce seeds the accumulator with the first element; the Spark
# fold replicates that seeding with a (started, v) struct so both engines
# execute the IDENTICAL floating-point op sequence.

_EWMA_ALPHA = 0.3


def _ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    series = events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", F.col("value").alias("v")))
        ).alias("xs")
    )
    zero = F.struct(
        F.lit(False).alias("started"), F.lit(0.0).alias("v")
    )
    step = lambda acc, x: F.struct(
        F.lit(True).alias("started"),
        F.when(~acc["started"], x["v"])
        .otherwise(_EWMA_ALPHA * x["v"] + (1 - _EWMA_ALPHA) * acc["v"])
        .alias("v"),
    )
    ew = F.aggregate(F.col("xs"), zero, step)["v"]
    return series.select(
        "user_id",
        F.size("xs").alias("n_events"),
        portable_round(ew, 4).alias("ewma_value"),
    )


_EWMA_PER_USER_SQL = f"""
SELECT user_id, CAST(len(vals) AS INTEGER) AS n_events,
       FLOOR(list_reduce(vals, (acc, x) -> {_EWMA_ALPHA} * x + {1 - _EWMA_ALPHA} * acc) * 10000 + 0.5) / 10000 AS ewma_value
FROM (
  SELECT user_id, list(value ORDER BY ts, event_id) AS vals
  FROM events GROUP BY user_id
)
"""

SPECS["ewma_per_user"] = QuerySpec(
    _ewma_per_user,
    _EWMA_PER_USER_SQL,
    "per-user EWMA: ordered-array gather + sequential fold (one shuffle)",
)
