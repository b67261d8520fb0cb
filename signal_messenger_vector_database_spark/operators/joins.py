"""Join operators beyond plain equi-joins: as-of and interval joins.

Absent from the reference (SURVEY §2.4 'Absent... range/as-of/interval
joins') but core to a training-data/timeseries pipeline.  Spark has no
native ASOF JOIN; the scalable re-expression is the union+window trick:

    tag both sides, union, one window over (key, ordered by ts),
    last_value(right payload, ignorenulls) carries the most recent right
    row forward, then keep left rows.

One shuffle on the key — contrast a naive theta-join (O(n*m) per key) or
per-key collect.  An interval join with an equi-key prefix stays a plain
sort-merge join with a residual range predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_value_cols: tuple[str, ...] = (),
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the most recent *prior* right row with the
    same key (inner semantics: left rows with no prior right row drop).

    ``strict=True`` matches ``right.ts < left.ts`` (DuckDB
    ``ASOF JOIN ... ON l.ts > r.ts``); ``False`` allows equal timestamps.
    """
    rv = [f"r_{c}" for c in right_value_cols]
    # tag ordering decides equal-ts semantics: with left tagged 0 and
    # right tagged 1, a right row at the same ts sorts AFTER the left row
    # and is not visible to it (strict); flip for non-strict.
    left_tag, right_tag = (0, 1) if strict else (1, 0)
    lt = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(left_tag).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(a) for c, a in zip(right_value_cols, rv)],
        F.lit(None).cast("timestamp").alias("_r_ts"),
    )
    rt = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(right_tag).alias("_tag"),
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(a) for c, a in zip(right_value_cols, rv)],
        F.col(ts_col).alias("_r_ts"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        F.col(on),
        F.col(ts_col),
        F.col("_tag"),
        F.col("_l"),
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in rv],
    )
    out = carried.filter((F.col("_tag") == left_tag) & F.col("asof_ts").isNotNull())
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        F.col("asof_ts"),
        *[F.col(a).alias(f"asof_{c}") for c, a in zip(right_value_cols, rv)],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_start: Column,
    right_end: Column,
) -> DataFrame:
    """Rows of ``left`` falling inside [start, end) intervals of ``right``,
    equi-keyed on ``on`` — executes as a sort-merge equi-join with a
    residual range predicate (no cross product)."""
    l, r = left.alias("l"), right.alias("r")
    return l.join(
        r,
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"l.{left_ts}") >= right_start)
        & (F.col(f"l.{left_ts}") < right_end),
    )
