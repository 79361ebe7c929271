"""Extended window / grouping / fuzzy-string surface.

Rounds out the analytic-function coverage beyond relational.py's
row_number/lag/running-sum: distribution functions (ntile,
percent_rank, cume_dist, first/nth value), full CUBE grouping, and
edit-distance fuzzy matching (the operator behind typo-tolerant
entity dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.functions import qround
from parquet_demo_spark.registry import register


@register(
    "q34_window_distribution",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           FLOOR(PERCENT_RANK() OVER w * 1000000 + 0.5) / 1000000
             AS pct_rank,
           FLOOR(CUME_DIST() OVER w * 1000000 + 0.5) / 1000000 AS cume,
           FIRST_VALUE(c_custkey) OVER w AS richest_in_segment,
           c_mktsegment
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_custkey
    """,
    doc="Distribution window functions: ntile/percent_rank/cume_dist/"
    "first_value per market segment (single window sort, shared frame).",
)
def q34(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        qround(F.percent_rank().over(w), 6).alias("pct_rank"),
        qround(F.cume_dist().over(w), 6).alias("cume"),
        F.first("c_custkey").over(w).alias("richest_in_segment"),
        "c_mktsegment",
    ).orderBy("c_custkey")


@register(
    "q35_fuzzy_match",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 5
    ORDER BY dist, name_a, name_b
    """,
    doc="Fuzzy string matching: Levenshtein edit distance over name "
    "pairs (typo-tolerant entity dedup primitive; at scale the pair "
    "space is first blocked by q43-style LSH, then edit-distance "
    "verifies candidates).",
)
def q35(spark: SparkSession, sf: str) -> DataFrame:
    n = load(spark, sf, "nation")
    a = n.alias("a")
    b = n.alias("b")
    dist = F.levenshtein(F.col("a.n_name"), F.col("b.n_name"))
    return (
        a.join(b, F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            dist.cast("bigint").alias("dist"),
        )
        .filter(F.col("dist") <= 5)
        .orderBy("dist", "name_a", "name_b")
    )


@register(
    "q36_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """,
    doc="Full CUBE: all 4 grouping sets in one Expand pass (rollup's "
    "superset — q12 covers the hierarchy case).",
)
def q36(spark: SparkSession, sf: str) -> DataFrame:
    from parquet_demo_spark.functions import dsum

    o = load(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_prio"),
            F.count("*").alias("n"),
            dsum("o_totalprice", "sum_price"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_prio",
            "n",
            "sum_price",
        )
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )
