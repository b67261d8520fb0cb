"""Generate the binary-PPM (P6) fixtures for ``decode_ppm_stats``
(VERDICT r11 #5: a real, pure-stdlib image decode with a DuckDB
``read_blob`` byte-arithmetic oracle).

Each file is a canonical P6 image (header ``P6\\n{w} {h}\\n255\\n`` —
single spaces, no comments, so the oracle can compute the header length
from the geometry in the FILENAME) whose raster bytes follow the closed
form ``byte[j] = (31*j + 17*f) % 256`` (j = raster offset, f = file
index).  The oracle does NOT rely on that formula — it reads the actual
bytes back via ``read_blob`` + hex arithmetic — but the formula makes
the fixtures reproducible and keeps all three channels' sums distinct.

Geometry set exercises 1- and 2-digit header widths (variable header
length) and non-square shapes.  Total < 2 KB committed.

Usage: python tools/gen_ppm_fixtures.py   # rewrites data/ppm/*.ppm
"""

from __future__ import annotations

import os

GEOMETRIES = [(4, 3), (8, 6), (16, 2), (3, 19), (12, 12), (7, 5)]

DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "signal_messenger_vector_database_spark",
    "data",
    "ppm",
)


def main() -> None:
    os.makedirs(DATA_DIR, exist_ok=True)
    for f, (w, h) in enumerate(GEOMETRIES):
        raster = bytes((31 * j + 17 * f) % 256 for j in range(w * h * 3))
        payload = f"P6\n{w} {h}\n255\n".encode() + raster
        path = os.path.join(DATA_DIR, f"img_{f:03d}_{w}x{h}.ppm")
        with open(path, "wb") as fh:
            fh.write(payload)
        print(f"{path}: {len(payload)} bytes")


if __name__ == "__main__":
    main()
