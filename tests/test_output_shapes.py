"""Catalog-wide output-shape audit (r2 VERDICT task 5).

The driver's CORRECTNESS harness canonicalizes query output via pandas
``sort_values``, which throws ``TypeError: unhashable type: 'list'`` on
any array/map/struct-typed cell — so an oracle-paired query with a
non-scalar top-level column reads as a failed row even when its values
are correct (this burned the ``multimodal_features`` slot in round 2).

This test builds every oracle-paired catalog query's DataFrame (plan
only — no collect) and asserts its final schema is scalar-only.
Rows-only entries are exempt: the driver's weaker rows-only check never
canonicalizes values.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType, StructType

from tests.conftest import SF_SMALL


def test_oracle_paired_outputs_are_scalar_only(spark):
    from signal_messenger_vector_database_spark.plans.catalog import all_specs

    offenders: dict[str, list[str]] = {}
    for name, spec in all_specs().items():
        if spec.oracle is None:
            continue
        df = spec.fn(spark, SF_SMALL)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad

    assert not offenders, (
        "oracle-paired queries with driver-incompatible non-scalar "
        f"top-level columns: {offenders}"
    )
