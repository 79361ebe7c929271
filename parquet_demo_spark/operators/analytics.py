"""Multi-join analytical queries (TPC-H-shaped): the plan shapes a
warehouse engine lives on — selective dimension filters driven through
broadcast joins into a fact-table aggregation.

Scale notes: in both queries every dimension (customer, orders-filter
results are NOT a dimension — orders is fact-sized and shuffles;
region/nation/supplier/customer are) is broadcast-eligible, so the only
shuffles are the fact-side aggregations. Join order is Catalyst's: the
date/segment filters are pushed below the joins (PushedFilters), which
shrinks the build sides before any join executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.functions import DEC, dec2
from parquet_demo_spark.registry import register


@register(
    "q30_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           CAST(MIN(o_orderdate) AS TIMESTAMP) AS o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: segment-filtered customers ⋈ date-filtered "
    "orders ⋈ lineitem, top-10 orders by exact-decimal revenue. "
    "Filters push below the joins; customer broadcast.",
)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    one = F.lit(1).cast(DEC)
    revenue = dec2("l_extendedprice") * (one - dec2("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.min("o_orderdate").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q31_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN supplier ON s_nationkey = n_nationkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey AND l_suppkey = s_suppkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: six-way join (region→nation→supplier/customer→"
    "orders→lineitem) with local-supplier constraint, revenue per "
    "nation. All dims broadcast; lineitem⋈orders is the only real "
    "shuffle.",
)
def q31(spark: SparkSession, sf: str) -> DataFrame:
    r = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf, "nation")
    s = load(spark, sf, "supplier")
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    one = F.lit(1).cast(DEC)
    revenue = dec2("l_extendedprice") * (one - dec2("l_discount"))
    nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(nations), s.s_nationkey == nations.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )
