"""Edge cases for the floor-quantization determinism helpers.

These pin the EXACT semantics both engines must share: floor(x*10^n+0.5)
is half-up-toward-+infinity (not HALF_UP away-from-zero), ties quantize
predictably, and the DuckDB SQL twins evaluate to the same values.
"""

from __future__ import annotations

import duckdb
import pytest

from parquet_demo_spark.functions import (
    mean6,
    mean6_sql,
    micro6_sql,
    qround,
    qround_sql,
)

CASES = [
    1.005,  # classic 2dp tie (binary repr sits just below)
    2.675,
    -1.005,  # negative tie: floor form rounds toward +inf
    -2.675,
    0.0032134999999999998,  # the measured sf0.1 near-tie mean
    0.616992 / 192,
    123.4567891,
    -0.0000005,
    0.0,
    1e-12,
]


@pytest.mark.parametrize("x", CASES)
@pytest.mark.parametrize("nd", [2, 6])
def test_qround_matches_duckdb_twin(spark, x, nd):
    from pyspark.sql import functions as F

    spark_val = (
        spark.range(1).select(qround(F.lit(x), nd).alias("r")).collect()[0]["r"]
    )
    duck_val = duckdb.sql(f"SELECT {qround_sql(repr(x), nd)} AS r").fetchone()[0]
    assert spark_val == duck_val, (x, nd, spark_val, duck_val)


@pytest.mark.parametrize("x", CASES)
def test_micro6_matches_duckdb_twin(spark, x):
    from pyspark.sql import functions as F

    from parquet_demo_spark.functions import micro6

    spark_val = (
        spark.range(1).select(micro6(F.lit(x)).alias("m")).collect()[0]["m"]
    )
    duck_val = duckdb.sql(f"SELECT {micro6_sql(repr(x))} AS m").fetchone()[0]
    assert spark_val == duck_val, (x, spark_val, duck_val)


def test_mean6_partition_count_invariance(spark):
    # the quantized mean must be identical at any parallelism — the
    # whole point of summing integer micros instead of doubles
    from pyspark.sql import functions as F

    vals = [(i, (i % 97) * 0.010001 + 0.0000005) for i in range(10_000)]
    df = spark.createDataFrame(vals, "id long, v double")
    means = set()
    for parts in (1, 7, 32):
        m = (
            df.repartition(parts)
            .agg(mean6(F.col("v")).alias("m"))
            .collect()[0]["m"]
        )
        means.add(m)
    assert len(means) == 1, means


def test_mean6_sql_twin_on_same_data(spark, tmp_path):
    from pyspark.sql import functions as F

    vals = [(i, (i % 31) * 0.070003) for i in range(5_000)]
    df = spark.createDataFrame(vals, "id long, v double")
    p = str(tmp_path / "vals.parquet")
    df.write.parquet(p)
    spark_m = (
        spark.read.parquet(p).agg(mean6(F.col("v")).alias("m")).collect()[0]["m"]
    )
    duck_m = duckdb.sql(
        f"SELECT {mean6_sql('v')} AS m FROM read_parquet('{p}/*.parquet')"
    ).fetchone()[0]
    assert spark_m == duck_m
