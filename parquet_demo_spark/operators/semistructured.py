"""Array / JSON surface S21–S22 (SURVEY §2B).

The reference's type system is flat primitives only (`run_example.py:83`:
"Nested structures are not supported here"). The engine adds first-class
nested columns: array<float> embeddings via higher-order functions
(transform/filter/aggregate/slice — all JVM-side, no Python), and JSON
string props via get_json_object.

FP determinism note: per-element values are scaled to integers
(floor(x*10⁴)) *before* summing, so array reductions are exact and
order-independent — the array-sum analogue of the decimal(18,2)
convention. Division by the dimension (64 = 2⁶) is exact in binary FP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.functions import dsum
from parquet_demo_spark.registry import register


@register(
    "q21_array_funcs",
    oracle="""
    SELECT vec_id, dim, sum_scaled,
           CAST(FLOOR(sum_scaled / CAST(dim AS DOUBLE)) AS BIGINT) AS mean_scaled,
           first3, n_pos
    FROM (
      SELECT vec_id,
             CAST(len(embedding) AS BIGINT) AS dim,
             list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT))),
               (acc, v) -> acc + v) AS sum_scaled,
             array_to_string(
               list_transform(embedding[1:3],
                 x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)
                           AS VARCHAR)),
               ',') AS first3,
             CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
      FROM embeddings)
    ORDER BY vec_id LIMIT 100
    """,
    doc="S21 higher-order array functions over array<float> embeddings: "
    "transform/aggregate (integer-scaled exact sum), slice, filter, size. "
    "first3 is emitted as a comma-joined string of integer-scaled values: "
    "registry invariant — no array/map/struct column may appear in a final "
    "projection, because the driver's pandas canonicalizer cannot sort "
    "list-typed columns (round-1 q21 ERR).",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    scaled_sum = F.aggregate(
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 10000).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return (
        emb.select(
            "vec_id",
            F.size("embedding").cast("bigint").alias("dim"),
            scaled_sum.alias("sum_scaled"),
            F.array_join(
                F.transform(
                    F.slice("embedding", 1, 3),
                    lambda x: F.floor(x.cast("double") * 10000)
                    .cast("bigint")
                    .cast("string"),
                ),
                ",",
            ).alias("first3"),
            F.size(F.filter(F.col("embedding"), lambda x: x > 0))
            .cast("bigint")
            .alias("n_pos"),
        )
        .withColumn(
            "mean_scaled",
            F.floor(F.col("sum_scaled") / F.col("dim").cast("double")).cast(
                "bigint"
            ),
        )
        .select("vec_id", "dim", "sum_scaled", "mean_scaled", "first3", "n_pos")
        .orderBy("vec_id")
        .limit(100)
    )


@register(
    "q22_json_funcs",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS kmod,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           COUNT(*) - COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS n_null_k
    FROM events
    GROUP BY kmod ORDER BY kmod
    """,
    doc="S22 JSON extraction (get_json_object) from the events.props "
    "string column, grouped modulo 10.",
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.withColumn("k", k)
        .groupBy((F.col("k") % 10).alias("kmod"))
        .agg(
            F.count("*").alias("n"),
            dsum("value", "sum_value"),
            (F.count("*") - F.count("k")).alias("n_null_k"),
        )
        .orderBy("kmod")
    )
