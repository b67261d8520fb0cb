"""Local replica of the driver's DuckDB-oracle compare.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin on the same
parquet, compares row count, column names, and an order-insensitive
canonical multiset of values.  Use while iterating so hash-mismatch classes
(float rounding, HUGEINT widening, timestamp rendering) surface before the
driver's per-round run.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from signal_messenger_vector_database_spark.schemas import TESTDATA_TABLES


def canon_value(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, Decimal):
        # Do NOT coerce to float: the driver canonicalizes Decimal by its
        # exact rendering, so decimal(21,6) '1.293600' vs DOUBLE '1.2936'
        # is a hash mismatch there.  Coercing here masked exactly that
        # class for two rounds (topk_pq_adc, r5-r7).  Canonicalize the
        # exact string so the local checker FAILS whenever the driver
        # would.
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v)) + ".0"
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(canon_value(r[i]) for i in order) for r in rows)


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession
    from signal_messenger_vector_database_spark.session import get_spark

    if os.environ.get("SMVD_HOSTILE"):
        # Adversarial physical layout: tiny parallelism, prime shuffle
        # width, ANSI on.  A query whose values depend on partitioning
        # (spark_partition_id leaks, non-deterministic tie-breaks,
        # overflow hidden by non-ANSI) fails HERE before a driver slot
        # is burned on it.
        spark = (
            SparkSession.builder.master("local[3]")
            .appName("oracle-check-hostile")
            .config("spark.sql.shuffle.partitions", "7")
            .config("spark.sql.ansi.enabled", "true")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            )
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    names = args or list(qs)

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    from pyspark.sql.types import ArrayType, MapType, StructType

    failures = []
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, sf_dir)
        scols = sdf.columns
        srows = sdf.collect()
        status_bits = []
        if name not in oracles:
            print(f"  {name:24s} rows={len(srows):7d}  (rows-only) {time.time()-t0:5.1f}s")
            if len(srows) == 0:
                failures.append((name, "zero rows on rows-only query"))
            continue
        # Comparator parity with the driver (r2 VERDICT issue 1): the
        # driver canonicalizes via pandas sort_values, which throws
        # "unhashable type" on array/map/struct cells.  Reject non-scalar
        # top-level columns here so the class surfaces BEFORE a driver
        # window slot is burned on it.
        bad_cols = [
            f.name
            for f in sdf.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad_cols:
            status_bits.append(
                f"NONSCALAR driver-incompatible array/struct columns: {bad_cols}"
            )
        # Oracles may embed absolute fixture paths (binaryfile_scan); the
        # driver always runs sf0.01, but local sweeps at other SFs must
        # retarget them (r2 ADVICE item 5).
        osql = oracles[name].replace("/root/testdata/sf0.01", sf_dir.rstrip("/"))
        cur = con.execute(osql)
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        if sorted(scols) != sorted(ocols):
            status_bits.append(f"SCHEMA spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            status_bits.append(f"ROWCOUNT spark={len(srows)} oracle={len(orows)}")
        if not status_bits:
            sc, oc = canon_rows(srows, scols), canon_rows(orows, ocols)
            if sc != oc:
                diff_s = list((sc - oc).items())[:3]
                diff_o = list((oc - sc).items())[:3]
                status_bits.append(f"VALUES spark-only={diff_s} oracle-only={diff_o}")
        status = "OK" if not status_bits else "FAIL " + " | ".join(status_bits)
        print(f"  {name:24s} rows={len(srows):7d}  {status[:400]} {time.time()-t0:5.1f}s")
        if status_bits:
            failures.append((name, status_bits[0][:200]))

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print(f"all {len(names)} queries OK")


if __name__ == "__main__":
    main()
