"""Statistical / data-quality analytics a 100 TB pipeline runs daily.

The reference's analytics surface stops at counter blocks (SURVEY §2.8,
src/main.rs stats block); these queries are the next rung a production
corpus needs, each expressed as one-pass relational aggregation so the
plan is a single shuffle with map-side partial aggregation:

- ``ols_regression``: closed-form simple linear regression (slope /
  intercept / r²) per group from ``covar_pop`` / ``var_pop`` / ``corr``
  aggregates.  No iterative solver, no driver math: the sufficient
  statistics are distributive, so the whole fit is one aggregate pass
  regardless of data size.
- ``zscore_outliers``: classic anomaly flag — per-event-type mean/stddev,
  then rows with |z| above threshold.  Implemented as groupBy + broadcast
  join of the tiny stats table back onto the fact, NOT a window over the
  fact: ``Window.partitionBy(event_type)`` would funnel every row of a hot
  type through one task at 100 TB, while the agg+join form partial-
  aggregates map-side and never skews.
- ``cumulative_distinct``: distinct-users-to-date per day.  COUNT(DISTINCT)
  over a running window is unbounded state; the scalable form is
  first-touch reduction (min day per user: one shuffle on user_id) then a
  running sum over the tiny per-day series.
- ``dq_audit``: declarative data-quality constraint checks (null keys,
  duplicate keys, referential orphans, domain violations) unioned into one
  (check, violations) report.  Per table the domain checks share a single
  conditional-aggregate scan; the orphan check is a broadcast anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_round
from ..io.sources import load_table
from .registry import QuerySpec


def _ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    slope = F.covar_pop("l_quantity", "l_extendedprice") / F.var_pop("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            portable_round(slope, 4).alias("slope"),
            portable_round(
                F.avg("l_extendedprice") - slope * F.avg("l_quantity"), 4
            ).alias("intercept"),
            portable_round(
                F.pow(F.corr("l_quantity", "l_extendedprice"), 2), 4
            ).alias("r2"),
        )
    )


# Same explicit covar_pop/var_pop formula on both engines (rather than
# DuckDB's regr_* macros) so the float op sequence matches exactly.
_OLS_SQL = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       FLOOR((covar_pop(l_quantity, l_extendedprice) / var_pop(l_quantity)) * 10000 + 0.5) / 10000 AS slope,
       FLOOR((AVG(l_extendedprice)
              - (covar_pop(l_quantity, l_extendedprice) / var_pop(l_quantity)) * AVG(l_quantity))
             * 10000 + 0.5) / 10000 AS intercept,
       FLOOR(POW(corr(l_quantity, l_extendedprice), 2) * 10000 + 0.5) / 10000 AS r2
FROM lineitem
GROUP BY l_returnflag
"""


def _zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.col("sigma") > 0)
        .select("event_id", "event_type", portable_round(z, 4).alias("z"))
        .filter(F.abs(F.col("z")) >= 2.5)
    )


_ZSCORE_SQL = """
WITH stats AS (
  SELECT event_type, AVG(value) AS mu, stddev_pop(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT * FROM (
  SELECT event_id, e.event_type,
         FLOOR(((value - mu) / sigma) * 10000 + 0.5) / 10000 AS z
  FROM events e JOIN stats USING (event_type)
  WHERE sigma > 0
) WHERE ABS(z) >= 2.5
"""


def _cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    first_hour = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("hour", "ts")).alias("hour")
    )
    hourly = first_hour.groupBy("hour").agg(F.count(F.lit(1)).alias("new_users"))
    # The running sum runs over one row per hour — driver-scale cardinality,
    # so the single-partition window is safe at any data size.
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return hourly.select(
        "hour", "new_users", F.sum("new_users").over(w).alias("cum_users")
    )


_CUMULATIVE_DISTINCT_SQL = """
WITH first_hour AS (
  SELECT user_id, MIN(date_trunc('hour', ts)) AS hour FROM events GROUP BY user_id
),
hourly AS (SELECT hour, CAST(COUNT(*) AS BIGINT) AS new_users FROM first_hour GROUP BY hour)
SELECT hour, new_users,
       CAST(SUM(new_users) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM hourly
"""


def _dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    # Domain checks on lineitem share ONE conditional-aggregate scan.
    li_checks = li.agg(
        F.sum(F.when(F.col("l_extendedprice") < 0, 1).otherwise(0)).alias(
            "negative_price"
        ),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
            ).otherwise(0)
        ).alias("discount_out_of_range"),
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)).alias(
            "null_orderkey"
        ),
    ).selectExpr(
        "stack(3, 'lineitem.negative_price', negative_price,"
        " 'lineitem.discount_out_of_range', discount_out_of_range,"
        " 'lineitem.null_orderkey', null_orderkey) AS (check, violations)"
    )

    dup_orders = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("orders.duplicate_orderkey").alias("check"), "violations")
    )
    orphan_orders = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders["o_custkey"] == customer["c_custkey"],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("orders.orphan_custkey").alias("check"), "violations")
    )
    dup_customer = (
        customer.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("customer.duplicate_custkey").alias("check"), "violations")
    )
    out = li_checks.unionByName(dup_orders).unionByName(orphan_orders).unionByName(
        dup_customer
    )
    return out.select("check", F.col("violations").cast("bigint").alias("violations"))


_DQ_AUDIT_SQL = """
SELECT 'lineitem.negative_price' AS check,
       CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS violations
FROM lineitem
UNION ALL
SELECT 'lineitem.discount_out_of_range',
       CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem.null_orderkey',
       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders.duplicate_orderkey', CAST(COUNT(*) AS BIGINT)
FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
UNION ALL
SELECT 'orders.orphan_custkey', CAST(COUNT(*) AS BIGINT)
FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'customer.duplicate_custkey', CAST(COUNT(*) AS BIGINT)
FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1)
"""


SPECS: dict[str, QuerySpec] = {
    "ols_regression": QuerySpec(
        _ols_regression,
        _OLS_SQL,
        "closed-form per-group linear fit from distributive aggregates",
    ),
    "zscore_outliers": QuerySpec(
        _zscore_outliers,
        _ZSCORE_SQL,
        "per-type z-score anomaly rows via agg + broadcast join (window-free)",
    ),
    "cumulative_distinct": QuerySpec(
        _cumulative_distinct,
        _CUMULATIVE_DISTINCT_SQL,
        "distinct-users-to-date via first-touch reduction + tiny running sum",
    ),
    "dq_audit": QuerySpec(
        _dq_audit,
        _DQ_AUDIT_SQL,
        "declarative DQ constraint report: nulls, dup keys, orphans, domains",
    ),
}
