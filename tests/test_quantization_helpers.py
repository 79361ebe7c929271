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


def test_hyperplane_bucket_udf_matches_fold_expr(spark):
    """The vectorized NumPy hyperplane bucket (r16) is row-for-row
    identical to the interpreted fold expression it replaced — on
    clean 64-dim vectors AND the degenerate rows whose fold goes NULL
    (wrong length, NULL array, NaN element), which both forms must
    assign to bucket 0. Integer dot products make this exact, never a
    tolerance comparison."""
    import math

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from parquet_demo_spark.operators.similarity import (
        _N_TABLES,
        _hyperplane_bucket,
        _hyperplane_bucket_expr,
    )

    def vec(seed: int) -> list:
        # deterministic values spanning signs and magnitudes incl.
        # exact-zero dots' neighborhood
        return [
            math.sin(seed * 97 + i * 13) * (0.002 * ((i + seed) % 7))
            for i in range(64)
        ]

    rows = [Row(vec_id=i, e=vec(i)) for i in range(50)]
    rows += [
        Row(vec_id=100, e=None),
        Row(vec_id=101, e=[0.1] * 63),          # short: fold NULL
        Row(vec_id=102, e=[0.1] * 65),          # long: fold NULL
        Row(vec_id=103, e=[0.0] * 64),          # all-zero dots: bits 0
        Row(vec_id=104, e=[float("nan")] + [0.1] * 63),  # NaN poisons
    ]
    df = spark.createDataFrame(rows, "vec_id int, e array<double>")
    for t in range(_N_TABLES):
        got = (
            df.select(
                "vec_id",
                _hyperplane_bucket(F.col("e"), t).alias("udf"),
                _hyperplane_bucket_expr(F.col("e"), t).alias("expr"),
            )
            .collect()
        )
        diverged = [
            (r.vec_id, r.udf, r.expr) for r in got if r.udf != r.expr
        ]
        assert diverged == [], f"table {t}: {diverged}"
