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


SPECS: dict[str, QuerySpec] = {
    "skew_salted_join": QuerySpec(
        _skew_salted_join,
        _SKEW_SALTED_JOIN_SQL,
        "salted skew join on a 3-key fact column; multiset equals plain join",
    ),
}
