"""JVM-side vector math over array<float>/array<double> columns.

This is the retrieval capability the reference *declared* but never shipped:
it installs pgvector + pgvectorscale and creates a VECTOR(768) column
(src/rag/sqlx.rs:22-29,42) yet no ``<->``/``<=>`` operator, index DDL,
ORDER BY or LIMIT appears anywhere in its source (SURVEY §0, E3 in §2.7).
Here cosine/L2/dot are pure Catalyst expressions (``zip_with`` +
``aggregate``) — they stay inside whole-stage codegen, vectorize over the
scan, and scale with ordinary Spark parallelism.  No Python UDF in the hot
path.

All math is done in double precision (arrays are cast) so results are
reproducible against the DuckDB oracle, which also computes list ops in
double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential left-to-right fold — deterministic summation order."""
    a, b = _as_double_array(a), _as_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = _as_double_array(a), _as_double_array(b)
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a| * |b|); matches DuckDB list_cosine_similarity on
    DOUBLE[] up to summation ulps (callers round before comparing)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
