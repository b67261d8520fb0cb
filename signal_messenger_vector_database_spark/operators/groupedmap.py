"""Grouped-map applyInPandas: per-group model fitting.

The third Pandas-UDF shape (after mapInPandas and
applyInPandasWithState): one Arrow batch per GROUP, for algorithms that
genuinely need the whole group in memory (model fits, per-entity
learning).  Demo operator: per-user OLS slope of value over time.

Determinism design (r8, closing the VERDICT r7 task-4 boundary): the
slope is DEFINED over exact integer sufficient statistics —

* the regressor is integer seconds since the user's first event
  (``unix_timestamp`` truncation semantics, ``epoch_us // 1_000_000``
  in the DuckDB oracle), and
* the response is the value at centi-grain,
  ``floor(value * 100 + 0.5)`` — exact for the 2-decimal fixture and
  deterministic for any input because both engines execute the same
  three double ops on the same stored double.

All four sums (Σt, Σv, Σt·v, Σt²) are then exact integers (Python
arbitrary-precision here, HUGEINT in DuckDB), so
``slope = 36.0 * (n·Σtv − Σt·Σv) / (n·Σtt − Σt²)`` — the 36 converts
centi-units/second to units/hour — performs exactly TWO double
roundings (the two int→double casts) and one division, identically in
both engines.  The previous float64/``regr_slope`` pair rounded apart at
the 1e-4 grain for 1 user in 1500 at sf0.1 (raw slope on a .xx5
boundary); with exact sufficient statistics the class is
unrepresentable, not merely rare.

Scale note: group size is the memory bound — a single giant group lands
on one worker.  Pre-aggregate or sample heavy groups first; AQE cannot
split a group.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

SLOPE_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n", LongType(), True),
        StructField("slope", DoubleType(), True),
    ]
)


def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # Exact integer sufficient statistics (see module docstring).  The
    # per-row Python loop is bounded by group size, which is already this
    # operator's documented memory bound; Python ints never overflow
    # (Σt² reaches ~1e17 at sf0.1 — past float64's 2^53 exactness but
    # trivially exact here).
    secs = [int(x) for x in pdf["sec"]]
    t0 = min(secs)
    t = [s - t0 for s in secs]
    v = [int(math.floor(x * 100 + 0.5)) for x in pdf["value"]]
    n = len(t)
    s_t = sum(t)
    s_v = sum(v)
    s_tv = sum(a * b for a, b in zip(t, v))
    s_tt = sum(a * a for a in t)
    num = n * s_tv - s_t * s_v
    den = n * s_tt - s_t * s_t
    # 36.0 = 3600 s/hr / 100 centi-units; parenthesization matches the
    # oracle SQL exactly (two casts, one divide, one multiply).
    # Degenerate group (single event / zero time spread): slope is NULL —
    # explicitly, because Arrow renders a pandas NaN as NULL anyway, so
    # NULL is the only value this column can actually carry cross-engine
    # (the oracle's CASE emits NULL to match; r8 code-review finding).
    slope = None if den == 0 else 36.0 * (float(num) / float(den))
    return pd.DataFrame(
        {"user_id": [int(pdf["user_id"].iloc[0])], "n": [n], "slope": [slope]}
    )


def per_user_trend(events: DataFrame) -> DataFrame:
    """Per-user value-over-time OLS slope in units/hour.

    The per-user time origin (min event second) is computed inside the
    grouped map — no ``Window.partitionBy`` pre-pass, so the plan is one
    shuffle (the groupBy) instead of two.
    """
    # Null rows are dropped BEFORE the grouped map (F6 null-tolerance):
    # the integer sufficient statistics cannot absorb a NaN (int(NaN)
    # raises), and the DuckDB twin must see the identical row set — its
    # SUMs would silently skip NULLs while COUNT(*) counted them,
    # desynchronizing the statistics (code-review r8 finding).  The twin
    # carries the same WHERE.
    prepared = events.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        "value",
    )
    return prepared.groupBy("user_id").applyInPandas(_fit_group, schema=SLOPE_SCHEMA)
