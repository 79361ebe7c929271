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


# ---------------------------------------------------------------------------
# q93 — TPC-H Q18 shape: large-volume customers
# ---------------------------------------------------------------------------


@register(
    "q93_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape (large-volume customers): a HAVING-filtered "
    "aggregate over the fact table semi-joins back into a 3-way join "
    "and re-aggregates. The `big` set is produced by ONE pre-aggregation "
    "of lineitem (map-side partials) and is tiny, so it broadcasts into "
    "the probe; top-20 by (price, key) is a TakeOrdered heap, never a "
    "global sort. Exact decimal quantity sums (order-independent).",
)
def q93(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"))
        .filter(F.col("sq") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        orders.join(
            F.broadcast(big), orders.o_orderkey == big.big_orderkey
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty")
        )
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q94 — time-range rolling window (peak 1-hour burst per user)
# ---------------------------------------------------------------------------


@register(
    "q94_rolling_burst",
    oracle="""
    WITH rolled AS (
      SELECT user_id,
             COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
             ) AS burst
      FROM events
    )
    SELECT user_id,
           CAST(MAX(burst) AS BIGINT) AS peak_burst,
           COUNT(*) AS n_events
    FROM rolled GROUP BY user_id ORDER BY user_id
    """,
    doc="Time-range rolling window: per-user event count over the "
    "trailing hour (RANGE frame over event time — rows with equal ts "
    "share a frame, so the result is order-independent under ties), "
    "reduced to each user's peak burst. Spark expresses the interval "
    "frame as rangeBetween over epoch MICROSECONDS — unix_timestamp "
    "truncates to seconds and genuinely shifts frame membership for "
    "events 3600.x real seconds apart (same µs-truncation class as the "
    "q63 oracle fix) — so the frame matches the oracle's full-precision "
    "INTERVAL bound exactly. One shuffle on user_id shared by the "
    "window and the final aggregate.",
)
def q94(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    rolled = ev.select(
        "user_id", F.count("*").over(w).alias("burst")
    )
    return (
        rolled.groupBy("user_id")
        .agg(
            F.max("burst").cast("bigint").alias("peak_burst"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )
