"""Pin the multi-scale oracle invariants.

The driver compares Spark vs DuckDB at sf0.01 only; round-7's
sf0.001/sf0.1 sweeps found four latent bugs that single-scale regime
had masked (ANSI divide-by-zero on an all-members corpus, the
percentile rounding-boundary/interpolation seam, the fixture-pinned
cl100k snapshot, the pinned-k semdedup twin).  This test keeps the
boundary-prone queries oracle-green at sf0.001 so the class cannot
silently come back — full sweeps stay in tools/oracle_check.py; this
is the CI-priced sample.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import canon_rows  # noqa: E402

SF = "/root/testdata/sf0.001"

# the queries the multi-scale sweeps actually caught (or re-keyed)
BOUNDARY_PRONE = [
    "bloom_membership",
    "percentile_summary",
    "tokenize_cl100k",
    "semdedup",
]


def _compare(spark, name, sf_dir):
    import __spark_entry__ as e
    from signal_messenger_vector_database_spark.schemas import TESTDATA_TABLES

    sdf = e.queries()[name](spark, sf_dir)
    srows = sdf.collect()

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    osql = e.oracle_sql()[name].replace("/root/testdata/sf0.01", sf_dir)
    cur = con.execute(osql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    assert sorted(sdf.columns) == sorted(ocols), name
    assert canon_rows(srows, sdf.columns) == canon_rows(orows, ocols), name


@pytest.mark.parametrize("name", BOUNDARY_PRONE)
def test_oracle_green_at_sf0001(spark, name):
    _compare(spark, name, SF)


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.1"), reason="sf0.1 fixture absent"
)
def test_user_trend_green_at_sf01(spark):
    """user_trend at the scale that exposed the r7 boundary (VERDICT r7
    task 4): 1 user in 1500 landed a raw slope on the 1e-4 .xx5 grain
    and numpy-vs-regr_slope rounded it apart.  The slope is now defined
    over exact integer sufficient statistics (operators/groupedmap.py),
    so both engines round the identical double — pinned here at sf0.1
    BEFORE the driver fixture scale ever moves."""
    _compare(spark, "user_trend", "/root/testdata/sf0.1")
