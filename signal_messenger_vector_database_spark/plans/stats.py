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


# --- weighted sampling, robust outliers, Zipf fit ---------------------------


def _md5_u16_sql(expr: str) -> str:
    """DuckDB twin of ``conv(substr(md5(x),1,4),16,10)`` (16-bit uniform
    from the portable hash) — DuckDB has no base-conv builtin, so the
    nibbles are decoded positionally (same idiom as plans/traindata.py)."""
    h = f"md5(CAST({expr} AS VARCHAR))"
    return (
        f"((instr('0123456789abcdef', substr({h}, 1, 1)) - 1) * 4096 + "
        f"(instr('0123456789abcdef', substr({h}, 2, 1)) - 1) * 256 + "
        f"(instr('0123456789abcdef', substr({h}, 3, 1)) - 1) * 16 + "
        f"(instr('0123456789abcdef', substr({h}, 4, 1)) - 1))"
    )


def _weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis-Spirakis A-Res:
    each row draws u ~ U(0,1) and keeps key = -ln(u)/w; the n smallest
    keys are an exact weighted sample.  One pass, no state: u comes from
    the portable md5 hash, so the "random" draw is reproducible on any
    engine and any cluster size — the property a 100 TB sampling job
    needs for reruns.  TakeOrderedAndProject keeps the top-n selection
    fully distributed (per-partition heaps, merge on the driver)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "int"
    )
    u = (h + F.lit(0.5)) / F.lit(65536.0)
    w = F.greatest(F.col("n_chars").cast("double"), F.lit(1.0))
    key = -F.log(u) / w
    return (
        docs.select(
            "doc_id",
            "n_chars",
            portable_round(key, 8).alias("res_key"),
        )
        .orderBy("res_key", "doc_id")
        .limit(10)
    )


_WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, n_chars,
       FLOOR((-ln(({_md5_u16_sql("doc_id")} + 0.5) / 65536.0)
              / greatest(CAST(n_chars AS DOUBLE), 1.0)) * 100000000 + 0.5) / 100000000 AS res_key
FROM documents
ORDER BY res_key, doc_id
LIMIT 10
"""


def _mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flags: |x - median| / (1.4826 * MAD) > 3.

    The z-score variant (``zscore_outliers``) breaks down when the tail
    itself inflates the stddev; median/MAD don't.  Two grouped exact-
    percentile aggregates (per-type medians are tiny and broadcast back);
    at 100 TB you'd swap ``percentile`` for ``approx_percentile`` —
    same plan shape."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    rz = F.col("adev") / (F.lit(1.4826) * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .select("event_id", "event_type", portable_round(rz, 4).alias("robust_z"))
        .filter(F.col("robust_z") > 3.0)
    )


_MAD_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
),
dev AS (
  SELECT event_id, e.event_type, ABS(value - med) AS adev
  FROM events e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY event_type
)
SELECT * FROM (
  SELECT event_id, d.event_type,
         FLOOR((adev / (1.4826 * mad)) * 10000 + 0.5) / 10000 AS robust_z
  FROM dev d JOIN mad USING (event_type)
  WHERE mad > 0
) WHERE robust_z > 3.0
"""


def _zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS of ln(freq) on ln(rank) over the top-100 words.
    A natural-language corpus gives slope near -1; word-soup or boilerplate
    drifts toward 0 — a one-number corpus-health check.  Scale shape
    (VERDICT r4 task 3): the top-100 selection is ``orderBy(...).limit``
    — TakeOrderedAndProject keeps a 100-row heap per partition and merges
    on the driver, so NO global window ever sees the full vocabulary;
    only the 100 survivors are ranked.  The fit reuses the distributive
    covar_pop/var_pop closed form."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.split(
                F.lower(
                    F.regexp_replace(
                        F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+", " "
                    )
                ),
                " ",
            )
        ).alias("w")
    )
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    top100 = counts.orderBy(F.desc("cnt"), F.asc("w")).limit(100)
    ranked = top100.select(
        "w",
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), F.asc("w")))
        .alias("rank"),
    )
    pts = ranked.select(
        F.log(F.col("rank").cast("double")).alias("lx"),
        F.log(F.col("cnt").cast("double")).alias("ly"),
    )
    slope = F.covar_pop("lx", "ly") / F.var_pop("lx")
    return pts.agg(
        F.count(F.lit(1)).alias("n_words"),
        portable_round(slope, 4).alias("slope"),
        portable_round(F.avg("ly") - slope * F.avg("lx"), 4).alias("intercept"),
        portable_round(F.pow(F.corr("lx", "ly"), 2), 4).alias("r2"),
    )


_ZIPF_SQL = """
WITH words AS (
  SELECT unnest(string_split(lower(regexp_replace(trim(COALESCE(text, '')), '\\s+', ' ', 'g')), ' ')) AS w
  FROM documents
),
counts AS (SELECT w, COUNT(*) AS cnt FROM words GROUP BY w),
ranked AS (
  SELECT w, cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rank FROM counts
),
pts AS (
  SELECT ln(CAST(rank AS DOUBLE)) AS lx, ln(CAST(cnt AS DOUBLE)) AS ly
  FROM ranked WHERE rank <= 100
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
       FLOOR((covar_pop(lx, ly) / var_pop(lx)) * 10000 + 0.5) / 10000 AS slope,
       FLOOR((AVG(ly) - (covar_pop(lx, ly) / var_pop(lx)) * AVG(lx)) * 10000 + 0.5) / 10000 AS intercept,
       FLOOR(POW(corr(lx, ly), 2) * 10000 + 0.5) / 10000 AS r2
FROM pts
"""


SPECS["weighted_sample"] = QuerySpec(
    _weighted_sample,
    _WEIGHTED_SAMPLE_SQL,
    "Efraimidis-Spirakis weighted sample via portable md5 draws",
)
SPECS["mad_outliers"] = QuerySpec(
    _mad_outliers,
    _MAD_SQL,
    "median/MAD robust outlier flags (tail-resistant z-score)",
)
SPECS["zipf_fit"] = QuerySpec(
    _zipf_fit,
    _ZIPF_SQL,
    "Zipf rank-frequency OLS fit over top-100 words (corpus health)",
)


def _deletion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact audit: given a deletion cohort
    (deterministic here: c_custkey % 97 == 0), count the rows each table
    would lose, following referential cascades customer -> orders ->
    lineitem.  Each cascade level is a semi-join against the (small)
    deletion frontier — the frontier is broadcast, the facts are scanned
    once and never shuffled.  The real deletion is the same plan with the
    anti-join complement written back (see merge_upsert /
    operators/sink.py for the write side)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    doomed_cust = customer.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    doomed_orders = orders.join(
        F.broadcast(doomed_cust),
        orders["o_custkey"] == doomed_cust["c_custkey"],
        "left_semi",
    ).select("o_orderkey")
    doomed_li = li.join(
        F.broadcast(doomed_orders),
        li["l_orderkey"] == doomed_orders["o_orderkey"],
        "left_semi",
    )
    counts = [
        doomed_cust.agg(F.count(F.lit(1)).alias("rows_deleted")).select(
            F.lit("customer").alias("table"), "rows_deleted"
        ),
        doomed_orders.agg(F.count(F.lit(1)).alias("rows_deleted")).select(
            F.lit("orders").alias("table"), "rows_deleted"
        ),
        doomed_li.agg(F.count(F.lit(1)).alias("rows_deleted")).select(
            F.lit("lineitem").alias("table"), "rows_deleted"
        ),
    ]
    out = counts[0].unionByName(counts[1]).unionByName(counts[2])
    return out.select("table", F.col("rows_deleted").cast("bigint").alias("rows_deleted"))


_DELETION_AUDIT_SQL = """
WITH doomed_cust AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
doomed_orders AS (
  SELECT o_orderkey FROM orders SEMI JOIN doomed_cust ON o_custkey = c_custkey
)
SELECT 'customer' AS "table", CAST(COUNT(*) AS BIGINT) AS rows_deleted FROM doomed_cust
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM doomed_orders
UNION ALL
SELECT 'lineitem', CAST(COUNT(*) AS BIGINT)
FROM lineitem SEMI JOIN doomed_orders ON l_orderkey = o_orderkey
"""


SPECS["deletion_audit"] = QuerySpec(
    _deletion_audit,
    _DELETION_AUDIT_SQL,
    "GDPR deletion-cascade impact counts via broadcast semi-joins",
)


def _table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics — the inputs a cost-based optimizer
    (and a human tuning partition counts) needs: per column, row count,
    exact NDV, null count, min/max.  One conditional-aggregate pass per
    table; at 100 TB swap exact count_distinct for approx_count_distinct
    (HLL) — same single-scan shape, which is exactly how Spark's own
    ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS runs."""
    li = load_table(spark, sf_dir, "lineitem")

    def col_stats(c: str):
        return li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col(c)).alias("ndv"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_nulls"),
            portable_round(F.min(F.col(c)).cast("double"), 4).alias("min_val"),
            portable_round(F.max(F.col(c)).cast("double"), 4).alias("max_val"),
        ).select(F.lit(c).alias("column"), "n_rows", "ndv", "n_nulls", "min_val", "max_val")

    cols = ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    out = col_stats(cols[0])
    for c in cols[1:]:
        out = out.unionByName(col_stats(c))
    return out.select(
        "column",
        "n_rows",
        F.col("ndv").cast("bigint").alias("ndv"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        "min_val",
        "max_val",
    )


_TABLE_STATS_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       FLOOR(CAST(MIN({c}) AS DOUBLE) * 10000 + 0.5) / 10000 AS min_val,
       FLOOR(CAST(MAX({c}) AS DOUBLE) * 10000 + 0.5) / 10000 AS max_val
FROM lineitem"""
    for c in ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
)


SPECS["table_stats"] = QuerySpec(
    _table_stats,
    _TABLE_STATS_SQL,
    "ANALYZE-style per-column stats (rows/NDV/nulls/min/max) in one scan each",
)


# --- CUSUM drift detection -----------------------------------------------
# Sequential change-point statistic per user: S+ accumulates positive
# deviations of `value` from the GLOBAL mean (slack k), alarms when S+
# exceeds h.  The recursive fold max(0, S + z - k) is rewritten via the
# classic prefix-sum identity  S_i = P_i - min(0, min_{j<=i} P_j)  with
# P_i the running sum of (z - k) — which turns an unexpressible recursion
# into two plain running windows per user.  That is ALSO the scalable
# shape: no per-user array gather, state is the window frame only, and
# the per-user partitions parallelize across the key space.  The
# centering mean is an exact DECIMAL sum / count so both engines subtract
# the identical constant; the windows then execute identical FP operand
# sequences, so values match bit-for-bit before the final rounding.

_CUSUM_K = 25.0   # slack per step, in raw value units
_CUSUM_H = 200.0  # alarm threshold


def _cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    mu = events.agg(
        (
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = F.sum(F.col("value") - F.col("mu") - F.lit(_CUSUM_K)).over(w)
    stepped = (
        events.crossJoin(F.broadcast(mu))
        .withColumn("p", p)
        .withColumn("s", F.col("p") - F.least(F.lit(0.0), F.min("p").over(w)))
    )
    return (
        stepped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            portable_round(F.max("s"), 4).alias("cusum_max"),
            F.sum(F.when(F.col("s") > _CUSUM_H, 1).otherwise(0))
            .cast("int")
            .alias("n_alarms"),
        )
        .filter(F.col("cusum_max") > 0)
    )


_CUSUM_SQL = f"""
WITH mu AS (
  SELECT CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mu
  FROM events
),
p AS (
  SELECT user_id, ts, event_id,
         SUM(value - mu - {_CUSUM_K}) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM events, mu
),
s AS (
  SELECT user_id,
         p - least(0.0::DOUBLE, MIN(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
  FROM p
)
SELECT user_id, CAST(COUNT(*) AS INTEGER) AS n_events,
       floor(MAX(s) * 10000.0 + 0.5) / 10000.0 AS cusum_max,
       CAST(SUM(CASE WHEN s > {_CUSUM_H} THEN 1 ELSE 0 END) AS INTEGER) AS n_alarms
FROM s GROUP BY user_id
HAVING floor(MAX(s) * 10000.0 + 0.5) / 10000.0 > 0
"""

SPECS["cusum_drift"] = QuerySpec(
    _cusum_drift,
    _CUSUM_SQL,
    f"per-user CUSUM drift statistic (k={_CUSUM_K}, h={_CUSUM_H}) via the prefix-sum identity, pure windows",
)


# --- winsorized robust aggregates ----------------------------------------
# Outlier-robust per-type means: clamp `value` to the [p05, p95] range
# and aggregate the clamped measure.  Same scale discipline as
# ``zscore_outliers``: the per-type bounds are a TINY aggregate
# broadcast-joined back onto the fact (never Window.partitionBy over a
# hot type), and the winsorized mean sums DECIMAL-cast clamped values so
# the result is order-independent.  Bounds are rounded to 2 decimals
# before clamping in BOTH engines — interpolated quantiles agree only to
# float ulps, and a deterministic bound makes the clamp deterministic.


def _winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # portable_round, not F.round: Spark HALF_UP on the binary expansion vs
    # DuckDB's shortest-decimal rounding disagree at .005 boundaries, and a
    # one-ulp bound shift cascades into every output column (ADVICE r3).
    bounds = events.groupBy("event_type").agg(
        portable_round(F.expr("percentile(value, 0.05)"), 2).alias("lo"),
        portable_round(F.expr("percentile(value, 0.95)"), 2).alias("hi"),
    )
    clamped = events.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "lo",
        "hi",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("w"),
        (F.col("value") < F.col("lo")).cast("int").alias("under"),
        (F.col("value") > F.col("hi")).cast("int").alias("over"),
    )
    return clamped.groupBy("event_type").agg(
        F.min("lo").alias("p05"),
        F.min("hi").alias("p95"),
        portable_round(
            F.sum(F.col("w").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("winsorized_mean"),
        F.sum("under").cast("long").alias("n_clamped_low"),
        F.sum("over").cast("long").alias("n_clamped_high"),
    )


_WINSORIZED_SQL = """
WITH bounds AS (
  SELECT event_type,
         floor(quantile_cont(value, 0.05) * 100.0 + 0.5) / 100.0 AS lo,
         floor(quantile_cont(value, 0.95) * 100.0 + 0.5) / 100.0 AS hi
  FROM events GROUP BY event_type
),
clamped AS (
  SELECT e.event_type, b.lo, b.hi,
         least(greatest(e.value, b.lo), b.hi) AS w,
         CASE WHEN e.value < b.lo THEN 1 ELSE 0 END AS under,
         CASE WHEN e.value > b.hi THEN 1 ELSE 0 END AS over
  FROM events e JOIN bounds b USING (event_type)
)
SELECT event_type,
       MIN(lo) AS p05, MIN(hi) AS p95,
       floor(CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS winsorized_mean,
       CAST(SUM(under) AS BIGINT) AS n_clamped_low,
       CAST(SUM(over) AS BIGINT) AS n_clamped_high
FROM clamped GROUP BY event_type
"""

SPECS["winsorized_stats"] = QuerySpec(
    _winsorized_stats,
    _WINSORIZED_SQL,
    "winsorized per-type robust mean: broadcast [p05,p95] bounds, DECIMAL-exact clamped sum",
)
