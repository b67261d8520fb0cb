"""Catalog-wide output-shape audit (r2 VERDICT task 5; r7 task 2).

The driver's CORRECTNESS harness canonicalizes query output via pandas
``sort_values``, which throws ``TypeError: unhashable type: 'list'`` on
any array/map/struct-typed cell — so an oracle-paired query with a
non-scalar top-level column reads as a failed row even when its values
are correct (this burned the ``multimodal_features`` slot in round 2).

This test builds every catalog query's DataFrame (plan only — no
collect) and asserts:

1. oracle-paired outputs are scalar-only (the pandas-canonicalizer
   constraint above); rows-only entries are exempt because the driver's
   weaker rows-only check never canonicalizes values, and
2. NO query emits a DecimalType column.  Spark renders decimal(21,6)
   as ``1.293600`` while DuckDB's DOUBLE renders ``1.2936`` — identical
   values, different canonical strings, so any DecimalType output is a
   latent driver hash-FAIL even when the arithmetic is bit-identical
   (this is what kept ``topk_pq_adc`` red through r5–r7: SQL decimal
   literals silently type the whole expression).  With this guard the
   class is unrepresentable in the catalog.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

from tests.conftest import SF_SMALL


def _walk_types(dt):
    yield dt
    if isinstance(dt, ArrayType):
        yield from _walk_types(dt.elementType)
    elif isinstance(dt, MapType):
        yield from _walk_types(dt.keyType)
        yield from _walk_types(dt.valueType)
    elif isinstance(dt, StructType):
        for f in dt.fields:
            yield from _walk_types(f.dataType)


def test_catalog_output_shapes(spark):
    from signal_messenger_vector_database_spark.plans.catalog import all_specs

    nonscalar: dict[str, list[str]] = {}
    decimals: dict[str, list[str]] = {}
    for name, spec in all_specs().items():
        df = spec.fn(spark, SF_SMALL)
        dec = [
            f.name
            for f in df.schema.fields
            if any(isinstance(t, DecimalType) for t in _walk_types(f.dataType))
        ]
        if dec:
            decimals[name] = dec
        if spec.oracle is None:
            continue
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            nonscalar[name] = bad

    assert not nonscalar, (
        "oracle-paired queries with driver-incompatible non-scalar "
        f"top-level columns: {nonscalar}"
    )
    assert not decimals, (
        "queries emitting DecimalType columns (Spark renders decimals "
        "with trailing zeros — '1.293600' vs DuckDB DOUBLE '1.2936' — "
        f"so these are latent driver hash-FAILs): {decimals}"
    )
