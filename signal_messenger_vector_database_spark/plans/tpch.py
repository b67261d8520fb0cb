"""Benchmark-grade multi-join queries (TPC-H Q3/Q18 shapes) and the
spark.sql surface (correlated subquery).

These exercise the optimizer paths that matter at 100 TB: join ordering
across fact-fact-dim chains, partial aggregation under HAVING, and
subquery decorrelation — all free from Catalyst because the plans are
declared, not hand-scheduled (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_round
from ..io.sources import load_table
from .registry import QuerySpec


# --- TPC-H Q3 shape: shipping priority ----------------------------------
def _q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-01-01"))
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
            "o_orderpriority",
        )
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


_Q3_SQL = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# --- TPC-H Q18 shape: large-volume orders (HAVING) ----------------------
def _q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )


_Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey
HAVING ROUND(SUM(l_quantity), 2) > 150
"""


# --- correlated scalar subquery via the spark.sql surface ---------------
def _correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    # unique view name: the driver may evaluate queries concurrently
    view = f"customer_v_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
        FROM {view} c
        WHERE c_acctbal > (SELECT 2 * AVG(c2.c_acctbal) FROM {view} c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


_CORRELATED_SUBQUERY_SQL = """
SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
FROM customer c
WHERE c_acctbal > (SELECT 2 * AVG(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
"""


# --- TPC-H Q5 shape: local supplier volume (6-way join) -----------------
def _q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
    )


_Q5_SQL = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


# --- TPC-H Q10 shape: returned-item customer ranking --------------------
def _q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- TPC-H Q4 shape: EXISTS subquery (semi-join decorrelation) ----------
def _q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    tag = uuid.uuid4().hex[:8]
    ov, lv = f"orders_q4_{tag}", f"lineitem_q4_{tag}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(ov)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(lv)
    # Catalyst decorrelates the EXISTS into a left-semi hash join — no
    # per-row subquery execution survives in the physical plan.
    return spark.sql(
        f"""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM {ov}
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM {lv}
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# --- TPC-H Q2 shape: correlated MIN subquery (cheapest line per part) ---
def _q2_min_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    tag = uuid.uuid4().hex[:8]
    pv, lv = f"part_q2_{tag}", f"lineitem_q2_{tag}"
    load_table(spark, sf_dir, "part").createOrReplaceTempView(pv)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(lv)
    return spark.sql(
        f"""
        SELECT p_partkey, p_brand, l_suppkey,
               ROUND(l_extendedprice, 2) AS price
        FROM {pv} p JOIN {lv} l ON p_partkey = l_partkey
        WHERE p_size <= 5
          AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                                 FROM {lv} l2 WHERE l2.l_partkey = p.p_partkey)
        """
    )


_Q2_SQL = """
SELECT p_partkey, p_brand, l_suppkey,
       ROUND(l_extendedprice, 2) AS price
FROM part p JOIN lineitem l ON p_partkey = l_partkey
WHERE p_size <= 5
  AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                         FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
"""


# --- TPC-H Q7 shape: bilateral trade volume by year ---------------------
def _q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("cust_nation") == "NATION_3") & (F.col("supp_nation") == "NATION_7")
    ) | ((F.col("cust_nation") == "NATION_7") & (F.col("supp_nation") == "NATION_3"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .filter(pair)
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


_Q7_SQL = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(date_part('year', l_shipdate) AS INTEGER) AS ship_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY 1, 2, 3
"""


# --- TPC-H Q13 shape: order-count distribution incl. zero ---------------
def _q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --- TPC-H Q17 shape: small-quantity revenue (correlated AVG) -----------
def _q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    tag = uuid.uuid4().hex[:8]
    pv, lv = f"part_q17_{tag}", f"lineitem_q17_{tag}"
    load_table(spark, sf_dir, "part").createOrReplaceTempView(pv)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(lv)
    return spark.sql(
        f"""
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
               COUNT(*) AS n_rows
        FROM {lv} l JOIN {pv} p ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23' AND p_size <= 10
          AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                            FROM {lv} l2 WHERE l2.l_partkey = p.p_partkey)
        """
    )


_Q17_SQL = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem l JOIN part p ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_size <= 10
  AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
"""


# --- TPC-H Q22 shape: dormant rich customers (anti join + scalar sub) ---
def _q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    eligible = (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "HOUSEHOLD"))
    )
    # every customer has some order at this SF; "dormant" = no URGENT
    # order, so the anti join produces a real survivor set
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    dormant = eligible.join(
        urgent, eligible["c_custkey"] == urgent["o_custkey"], "left_anti"
    )
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


_Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# --- TPC-H Q15 shape: top supplier by derived revenue -------------------
# Revenue is rounded BEFORE the max/equality compare: cross-engine double
# sums differ at ulp, and a max-equality on unrounded doubles could pick
# different winners.
def _q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-07-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


# --- TPC-H Q11 shape: groups exceeding a global-scalar share ------------
def _q11_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    value = F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
    per_nation = (
        lineitem.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(value, 2).alias("nation_value"))
    )
    total = per_nation.agg(
        F.round(F.sum("nation_value"), 2).alias("total_value")
    )
    # HAVING against a global scalar: the tiny total rides a broadcast;
    # the per-group table is not re-aggregated.
    return (
        per_nation.join(F.broadcast(total))
        .filter(F.col("nation_value") > 0.05 * F.col("total_value"))
        .select("n_name", "nation_value")
    )


_Q11_SQL = """
WITH per_nation AS (
  SELECT n_name, ROUND(SUM(l_extendedprice * l_quantity), 2) AS nation_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, nation_value
FROM per_nation
WHERE nation_value > 0.05 * (SELECT ROUND(SUM(nation_value), 2) FROM per_nation)
"""


# --- TPC-H Q8 shape: market share ratio by year -------------------------
def _q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.sum(F.when(F.col("n_name") == "NATION_5", rev).otherwise(F.lit(0.0)))
    total = F.sum(rev)
    return (
        lineitem.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(target, 2).alias("target_rev"),
            F.round(total, 2).alias("total_rev"),
            portable_round(target / total, 4).alias("mkt_share"),
        )
    )


_Q8_SQL = """
SELECT CAST(date_part('year', l_shipdate) AS INTEGER) AS ship_year,
       ROUND(SUM(CASE WHEN n_name = 'NATION_5'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2)
         AS target_rev,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev,
       FLOOR((SUM(CASE WHEN n_name = 'NATION_5'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
              / SUM(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000
         AS mkt_share
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1
"""


# --- TPC-H Q9 shape: profit by nation and year --------------------------
# partsupp/supplycost doesn't exist in the fixture; p_retailprice*0.6
# stands in as unit cost — the optimizer shape (two dim joins + derived
# measure + two-key agg) is what matters.
def _q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * 0.6 * F.col("l_quantity")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("l_shipdate").alias("ship_year"))
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


_Q9_SQL = """
SELECT n_name, CAST(date_part('year', l_shipdate) AS INTEGER) AS ship_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)
                 - p_retailprice * 0.6 * l_quantity), 2) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


SPECS: dict[str, QuerySpec] = {
    "q8_market_share": QuerySpec(
        _q8_market_share, _Q8_SQL, "TPC-H Q8 shape: conditional-share ratio by year"
    ),
    "q9_nation_profit": QuerySpec(
        _q9_nation_profit, _Q9_SQL, "TPC-H Q9 shape: derived profit by nation x year"
    ),
    "q11_value_share": QuerySpec(
        _q11_value_share, _Q11_SQL, "TPC-H Q11 shape: HAVING vs global-scalar share"
    ),
    "q15_top_supplier": QuerySpec(
        _q15_top_supplier, _Q15_SQL, "TPC-H Q15 shape: derived-view max-revenue supplier"
    ),
    "q7_nation_volume": QuerySpec(
        _q7_nation_volume, _Q7_SQL, "TPC-H Q7 shape: bilateral nation-pair volume by year"
    ),
    "q13_order_distribution": QuerySpec(
        _q13_order_distribution, _Q13_SQL, "TPC-H Q13 shape: double groupBy incl. zero-order customers"
    ),
    "q17_small_quantity": QuerySpec(
        _q17_small_quantity, _Q17_SQL, "TPC-H Q17 shape: correlated AVG subquery"
    ),
    "q22_dormant_customers": QuerySpec(
        _q22_dormant_customers, _Q22_SQL, "TPC-H Q22 shape: scalar subquery + anti join"
    ),
    "q4_priority_exists": QuerySpec(
        _q4_priority_exists, _Q4_SQL, "TPC-H Q4 shape: EXISTS decorrelated to semi join"
    ),
    "q2_min_price": QuerySpec(
        _q2_min_price, _Q2_SQL, "TPC-H Q2 shape: correlated MIN subquery"
    ),
    "q3_shipping_priority": QuerySpec(_q3_shipping_priority, _Q3_SQL, "TPC-H Q3 shape: 3-way join + agg + top-k"),
    "q5_local_supplier": QuerySpec(_q5_local_supplier, _Q5_SQL, "TPC-H Q5 shape: 6-way join with region filter"),
    "q10_returned_items": QuerySpec(_q10_returned_items, _Q10_SQL, "TPC-H Q10 shape: returned-items ranking"),
    "q18_large_orders": QuerySpec(_q18_large_orders, _Q18_SQL, "TPC-H Q18 shape: HAVING over 3-way join"),
    "correlated_subquery": QuerySpec(_correlated_subquery, _CORRELATED_SUBQUERY_SQL, "correlated scalar subquery (spark.sql surface)"),
}


# --- TPC-H Q12 shape: priority classes by line status --------------------
# The fixture has no l_shipmode, so l_linestatus stands in as the 2-value
# classification dimension; the characteristic shape — fact-fact equi-join
# + date range + conditional two-way counts — is intact.
def _q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --- TPC-H Q20 shape: part-promotion suppliers ---------------------------
# No partsupp table in the fixture, so the availability predicate becomes
# a shipped-quantity HAVING over the lineitem-part join; the shape — dim
# filter -> agg -> semi-join into supplier — is the one that matters: the
# supplier table is never joined to the fact, only semi-joined against a
# small aggregated key set.
def _q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    heavy = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(
            F.broadcast(part.filter(F.col("p_name").like("red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


_Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 50.0
)
ORDER BY s_name
"""


# --- TPC-H Q21 shape: suppliers who kept orders waiting ------------------
# Lateness is adapted to l_shipdate > o_orderdate + 60 days (the fixture
# has no commit/receipt dates).  The characteristic plan is preserved:
# EXISTS + NOT EXISTS over lineitem self-correlations, which Catalyst
# decorrelates into one left-semi and one left-anti hash join on
# l_orderkey — no per-row subquery execution survives.
def _q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    tag = uuid.uuid4().hex[:8]
    sv, lv, ov, nv = (f"{t}_q21_{tag}" for t in ("supplier", "lineitem", "orders", "nation"))
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(sv)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(lv)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(ov)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(nv)
    return spark.sql(
        f"""
        SELECT s_name, COUNT(*) AS numwait
        FROM {sv} JOIN {lv} l1 ON s_suppkey = l1.l_suppkey
        JOIN {ov} ON o_orderkey = l1.l_orderkey
        JOIN {nv} ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM {lv} l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM {lv} l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
        """
    )


_Q21_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


SPECS["q12_priority_classes"] = QuerySpec(
    _q12_priority_classes, _Q12_SQL, "TPC-H Q12 shape: conditional priority counts (linestatus as mode)"
)
SPECS["q20_part_promotion"] = QuerySpec(
    _q20_part_promotion, _Q20_SQL, "TPC-H Q20 shape: agg-HAVING key set semi-joined into supplier"
)
SPECS["q21_waiting_supplier"] = QuerySpec(
    _q21_waiting_supplier, _Q21_SQL, "TPC-H Q21 shape: EXISTS + NOT EXISTS self-correlations (semi+anti joins)"
)
