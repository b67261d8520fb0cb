"""Round-13 bench-mover adjudication (VERDICT r12 #4).

Two raw movers from the r12 bench get the 3x-repeat control method:

* ``simhash_hamming_pairs_w64`` — 1.18x raw (3.79 -> 4.46 s).  Its
  family took the r12 input-spread change, so this is an A/B: spread
  ON (production) vs spread OFF (ensure_parallelism stubbed to
  identity), 3 repeats each, at sf0.1.
* ``window_range_frame`` — 1.23x raw (0.46 -> 0.56 s, sub-second
  class).  3 repeats; no plan change since r2, so the expectation is
  sandbox noise.

In-run controls per the r11/r12 method: ``tokenize`` (compute canary)
and ``q5_local_supplier`` (untouched since r2 — if IT moves, the box
moved).  Prints one JSON line per (arm, repeat) and a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = [
    "tokenize",
    "q5_local_supplier",
    "window_range_frame",
    "simhash_hamming_pairs_w64",
]


def main() -> None:
    import __spark_entry__ as entry

    from signal_messenger_vector_database_spark.session import get_spark

    spark = get_spark("adjudicate-r13")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    sf = "/root/testdata/sf0.1"

    # codegen/JIT warmup (the bench discipline)
    for n in NAMES:
        qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    import signal_messenger_vector_database_spark.io.sources as S

    real_spread = S.ensure_parallelism
    out: dict = {}
    for arm in ("spread_on", "spread_off"):
        S.ensure_parallelism = real_spread if arm == "spread_on" else (
            lambda df: df
        )
        runs: dict[str, list[float]] = {n: [] for n in NAMES}
        for _rep in range(3):
            for n in NAMES:
                spark.catalog.clearCache()
                t0 = time.time()
                qs[n](spark, sf).write.format("noop").mode("overwrite").save()
                runs[n].append(round(time.time() - t0, 2))
        out[arm] = {n: v for n, v in runs.items()}
        print(json.dumps({arm: runs}), flush=True)
    S.ensure_parallelism = real_spread

    med = {
        arm: {n: sorted(v)[1] for n, v in runs.items()}
        for arm, runs in out.items()
    }
    print(json.dumps({"median": med}))


if __name__ == "__main__":
    main()
