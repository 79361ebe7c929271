"""Registry-wide output-shape invariants.

The driver canonicalizes every query result with pandas ``sort_values``
before hashing; list/dict-typed cells are unhashable there, so a query
whose FINAL projection contains an array/map/struct column can never get
a green CORRECTNESS row (round-1 q21/q59b ERR). Complex types are fine
mid-plan — the invariant applies only to the output schema.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from parquet_demo_spark.registry import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_schema_is_flat(spark, sf_smoke, name):
    """No array/map/struct column in any query's final projection."""
    df = QUERIES[name].spark(spark, sf_smoke)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name} exposes complex-typed output columns {bad}; project them "
        "to scalars/strings at the query edge (driver canon requirement)"
    )
