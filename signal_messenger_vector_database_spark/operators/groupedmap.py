"""Grouped-map applyInPandas: per-group model fitting.

The third Pandas-UDF shape (after mapInPandas and
applyInPandasWithState): one Arrow batch per GROUP, for algorithms that
genuinely need the whole group in memory (model fits, per-entity
learning).  Demo operator: per-user OLS slope of value over time —
computed with the closed-form cov/var formula so the DuckDB oracle
(regr_slope) agrees to float precision.

Scale note: group size is the memory bound — a single giant group lands
on one worker.  Pre-aggregate or sample heavy groups first; AQE cannot
split a group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType
from pyspark.sql.window import Window

SLOPE_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n", LongType(), True),
        StructField("slope", DoubleType(), True),
    ]
)


def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
    t = pdf["t"].astype("float64")
    v = pdf["value"].astype("float64")
    n = len(pdf)
    var = (t * t).mean() - t.mean() ** 2
    slope = float("nan") if var == 0 else ((t * v).mean() - t.mean() * v.mean()) / var
    return pd.DataFrame(
        {"user_id": [int(pdf["user_id"].iloc[0])], "n": [n], "slope": [slope]}
    )


def per_user_trend(events: DataFrame) -> DataFrame:
    """Per-user value-over-time OLS slope, hours since the user's first
    event (normalizing the regressor keeps slopes in a range where
    rounding is meaningful)."""
    w_min = F.min(F.unix_timestamp("ts")).over(Window.partitionBy("user_id"))
    prepared = events.select(
        "user_id",
        ((F.unix_timestamp("ts") - w_min) / 3600.0).alias("t"),
        "value",
    )
    return prepared.groupBy("user_id").applyInPandas(_fit_group, schema=SLOPE_SCHEMA)
