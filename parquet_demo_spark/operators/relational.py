"""Relational query surface S1–S20 + S28 (SURVEY §2B).

The reference has no query engine at all (SURVEY intro: "no SQL parser, no
join, no aggregation, no optimizer" — its pipelines are scan→convert→sink,
``examples/ingest_parquet_to_mongo_stream.py:102-181``). The charter
requires full query capability over the same columnar data model; this
module declares it as Catalyst logical plans.

Scale notes (local[32] is the test rig; the design target is 1000
executors / 100 TB):

- Dimension joins (region/nation/customer/part at fixture scale, or any
  dim ≲ the 64 MiB broadcast threshold) are broadcast — no shuffle of the
  fact side. ``q05`` hints it explicitly; AQE converts the others at
  runtime from observed sizes.
- Fact-fact joins (lineitem⋈orders) shuffle on the join key; AQE handles
  skew by splitting oversized partitions (skewJoin on in session.py).
- Aggregations are partial (map-side combine) before the shuffle — free
  with groupBy/agg; the decimal(18,2) per-row cast keeps partial sums
  exact so the merge order never changes the result.
- Top-k (orderBy+limit) plans as TakeOrderedAndProject: per-partition
  heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.functions import DEC, davg, dec2, dsum
from parquet_demo_spark.registry import register

# ---------------------------------------------------------------------------
# S1 scan
# ---------------------------------------------------------------------------


@register(
    "q01_scan_count",
    oracle="SELECT COUNT(*) AS cnt FROM lineitem",
    doc="S1 parquet scan: COUNT(*) over lineitem (vectorized reader; "
    "no columns materialized — count uses row-group metadata).",
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "lineitem").agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# S2 projection
# ---------------------------------------------------------------------------


@register(
    "q02_projection",
    oracle="""
    SELECT l_orderkey, l_quantity FROM lineitem
    ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100
    """,
    doc="S2 projection + deterministic top-100; column pruning reaches the "
    "scan (ReadSchema shows 3 columns). (orderkey,linenumber) is NOT "
    "unique in this fixture — l_quantity joins the sort so tied rows are "
    "interchangeable w.r.t. the projected columns.",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .select("l_orderkey", "l_quantity")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# S3 filters
# ---------------------------------------------------------------------------


@register(
    "q03_filter",
    oracle="""
    SELECT COUNT(*) AS cnt FROM orders
    WHERE o_orderstatus IN ('F','O')
      AND o_totalprice BETWEEN 1000 AND 100000
      AND o_orderpriority LIKE '%URGENT%'
    """,
    doc="S3 predicates (IN/BETWEEN/LIKE) — all pushed to the parquet scan "
    "(PushedFilters in explain).",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(1000, 100000)
        & F.col("o_orderpriority").like("%URGENT%")
    ).agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# S4 inner equi-join
# ---------------------------------------------------------------------------


@register(
    "q04_join_inner",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="S4 inner equi-join orders⋈customer; customer is dim-sized → AQE "
    "broadcasts it, no shuffle of orders.",
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# S5 broadcast join
# ---------------------------------------------------------------------------


@register(
    "q05_join_broadcast",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand
    """,
    doc="S5 explicit broadcast join (reference has no joins; at 100 TB the "
    "part dim is small relative to lineitem — broadcast avoids shuffling "
    "the fact table).",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(dsum("l_quantity", "sum_qty"))
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# S6 outer joins
# ---------------------------------------------------------------------------


@register(
    "q06_join_left_outer",
    oracle="""
    SELECT COUNT(*) AS n_customers_no_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    WHERE o_orderkey IS NULL
    """,
    doc="S6 left outer join + IS NULL: customers with no orders.",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .agg(F.count("*").alias("n_customers_no_orders"))
    )


# ---------------------------------------------------------------------------
# S7 semi / anti join
# ---------------------------------------------------------------------------


@register(
    "q07_join_anti",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey LIMIT 100
    """,
    doc="S7 left-anti join (NOT EXISTS); dual of q06.",
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(100)
    )


@register(
    "q07b_join_semi",
    oracle="""
    SELECT COUNT(*) AS n_active FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="S7 left-semi join (EXISTS): customers with ≥1 order.",
)
def q07b(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count("*").alias("n_active")
    )


# ---------------------------------------------------------------------------
# S8 cross / theta join
# ---------------------------------------------------------------------------


@register(
    "q08_join_cross",
    oracle="""
    SELECT COUNT(*) AS n_pairs
    FROM region CROSS JOIN nation
    WHERE r_regionkey <> n_regionkey
    """,
    doc="S8 cross join + theta predicate (BroadcastNestedLoopJoin; both "
    "sides tiny dims).",
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    r = load(spark, sf, "region")
    n = load(spark, sf, "nation")
    return (
        r.crossJoin(n)
        .filter(F.col("r_regionkey") != F.col("n_regionkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# S9 range join
# ---------------------------------------------------------------------------


@register(
    "q09_join_range",
    oracle="""
    SELECT COUNT(*) AS n_in_window
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate BETWEEN o_orderdate
                         AND o_orderdate + INTERVAL 90 DAY
    """,
    doc="S9 range/interval predicate on top of the equi-join key — stays a "
    "shuffle-hash/sort-merge equi-join with a residual range filter "
    "(never a nested-loop).",
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate").between(
                F.col("o_orderdate"),
                F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            )
        )
        .agg(F.count("*").alias("n_in_window"))
    )


# ---------------------------------------------------------------------------
# S10 hash aggregate (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@register(
    "q10_agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(l_quantity) * 100 + 0.5) / 100 AS avg_qty,
           FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(l_extendedprice) * 100 + 0.5) / 100 AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="S10 flagship: TPC-H Q1-shaped pricing summary. Partial aggregation "
    "map-side, exact-decimal per-row casts make the merge order "
    "irrelevant (reference has no aggregation at all).",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    one = F.lit(1).cast(DEC)
    disc_price = dec2("l_extendedprice") * (one - dec2("l_discount"))
    charge = disc_price * (one + dec2("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# S11 distinct
# ---------------------------------------------------------------------------


@register(
    "q11_count_distinct",
    oracle="SELECT COUNT(DISTINCT o_custkey) AS n_custs FROM orders",
    doc="S11 count-distinct (two-phase: partial distinct per partition, "
    "then merge — no full-row shuffle).",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "orders").agg(
        F.countDistinct("o_custkey").alias("n_custs")
    )


# ---------------------------------------------------------------------------
# S12 rollup / grouping sets
# ---------------------------------------------------------------------------


@register(
    "q12_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """,
    doc="S12 ROLLUP with GROUPING flags (Expand operator: one pass, "
    "3 grouping sets).",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_prio"),
            F.count("*").alias("n"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n")
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# S13 window ranking
# ---------------------------------------------------------------------------


@register(
    "q13_window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders)
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    doc="S13 top-3 orders per customer via row_number. At scale Spark "
    "plans a WindowGroupLimit (partial top-k before the shuffle).",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# S14 window analytic + frame
# ---------------------------------------------------------------------------


@register(
    "q14_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                - COALESCE(LAG(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                    CAST(o_totalprice AS DECIMAL(18,2)))
                AS DOUBLE) AS delta_prev
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    doc="S14 running sum (ROWS UNBOUNDED PRECEDING) + lag delta, exact "
    "decimal accumulation.",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = dec2("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_total"),
        (price - F.coalesce(F.lag(price).over(w), price))
        .cast("double")
        .alias("delta_prev"),
    ).orderBy("o_custkey", "o_orderkey")


# ---------------------------------------------------------------------------
# S15 top-k
# ---------------------------------------------------------------------------


@register(
    "q15_topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
    doc="S15 global top-20 → TakeOrderedAndProject (per-partition heaps, "
    "no full sort even at 100 TB).",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# S16 set operations
# ---------------------------------------------------------------------------


@register(
    "q16_set_ops",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM
        (SELECT o_custkey FROM orders INTERSECT SELECT c_custkey FROM customer))
        AS n_intersect,
      (SELECT COUNT(*) FROM
        (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders))
        AS n_except,
      (SELECT COUNT(*) FROM
        (SELECT c_custkey FROM customer UNION SELECT o_custkey FROM orders))
        AS n_union
    """,
    doc="S16 INTERSECT / EXCEPT / UNION (distinct semantics) as one row of "
    "three scalar counts.",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    ok = load(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    ck = load(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    inter = ok.intersect(ck).agg(F.count("*").alias("n_intersect"))
    exc = ck.subtract(ok).agg(F.count("*").alias("n_except"))
    uni = ck.union(ok).distinct().agg(F.count("*").alias("n_union"))
    return inter.crossJoin(exc).crossJoin(uni)


# ---------------------------------------------------------------------------
# S17 string functions
# ---------------------------------------------------------------------------


@register(
    "q17_string_funcs",
    oracle="""
    SELECT n_nationkey, n_name,
           UPPER(SUBSTR(n_name, 1, 3)) AS abbrev,
           CAST(LENGTH(n_name) AS BIGINT) AS name_len,
           CAST(LENGTH(REGEXP_REPLACE(n_name, '[^AEIOUaeiou]', '', 'g')) AS BIGINT)
             AS n_vowels,
           CONCAT(TRIM(n_name), '_', LPAD(CAST(n_nationkey AS VARCHAR), 3, '0'))
             AS tag,
           REGEXP_EXTRACT(n_name, '^([A-Z]+)', 1) AS lead_caps
    FROM nation ORDER BY n_nationkey
    """,
    doc="S17 string surface: upper/substr/length/regexp_replace/"
    "regexp_extract/trim/lpad/concat.",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    n = load(spark, sf, "nation")
    return n.select(
        "n_nationkey",
        "n_name",
        F.upper(F.substring("n_name", 1, 3)).alias("abbrev"),
        F.length("n_name").cast("bigint").alias("name_len"),
        F.length(F.regexp_replace("n_name", "[^AEIOUaeiou]", ""))
        .cast("bigint")
        .alias("n_vowels"),
        F.concat(
            F.trim(F.col("n_name")),
            F.lit("_"),
            F.lpad(F.col("n_nationkey").cast("string"), 3, "0"),
        ).alias("tag"),
        F.regexp_extract("n_name", "^([A-Z]+)", 1).alias("lead_caps"),
    ).orderBy("n_nationkey")


# ---------------------------------------------------------------------------
# S18 date/time functions
# ---------------------------------------------------------------------------


@register(
    "q18_date_funcs",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           CAST(year(MIN(o_orderdate)) AS BIGINT) AS y,
           CAST(month(MIN(o_orderdate)) AS BIGINT) AS m,
           COUNT(*) AS n_orders,
           CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01'))
                AS BIGINT) AS max_days_to_1999
    FROM orders
    GROUP BY date_trunc('month', o_orderdate)
    ORDER BY month
    """,
    doc="S18 temporal surface: date_trunc/year/month/datediff; month "
    "bucketing is the partition key you'd use for a date-partitioned "
    "100 TB layout.",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.year(F.min("o_orderdate")).cast("bigint").alias("y"),
            F.month(F.min("o_orderdate")).cast("bigint").alias("m"),
            F.count("*").alias("n_orders"),
            F.max(
                F.datediff(
                    F.lit("1999-01-01").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
            )
            .cast("bigint")
            .alias("max_days_to_1999"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# S19 math functions
# ---------------------------------------------------------------------------


@register(
    "q19_math_funcs",
    oracle="""
    SELECT p_partkey,
           ROUND(SQRT(p_retailprice), 2) AS sqrt_price,
           CAST(ABS(p_size - 25) AS BIGINT) AS abs_dist,
           CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_price,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_price,
           CAST(((p_size % 7) + 7) % 7 AS BIGINT) AS size_mod7,
           CAST(POWER(p_size, 2) AS BIGINT) AS size_sq
    FROM part ORDER BY p_partkey
    """,
    doc="S19 math surface: round/sqrt/abs/ceil/floor/pmod/power "
    "(all whole-stage-codegen'd).",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.round(F.sqrt("p_retailprice"), 2).alias("sqrt_price"),
        F.abs(F.col("p_size") - 25).cast("bigint").alias("abs_dist"),
        F.ceil("p_retailprice").cast("bigint").alias("ceil_price"),
        F.floor("p_retailprice").cast("bigint").alias("floor_price"),
        F.pmod(F.col("p_size"), F.lit(7)).cast("bigint").alias("size_mod7"),
        F.pow(F.col("p_size"), 2).cast("bigint").alias("size_sq"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# S20 conditional / null functions
# ---------------------------------------------------------------------------


@register(
    "q20_conditional",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS band,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(LEAST(o_totalprice, 100000.0) AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_capped,
           COUNT(*) - COUNT(NULLIF(o_orderstatus, 'O')) AS n_open,
           CAST(SUM(CAST(GREATEST(o_totalprice, 1000.0) AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_floored
    FROM orders
    GROUP BY band ORDER BY band
    """,
    doc="S20 CASE WHEN bands + coalesce/nullif/least/greatest.",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
        .alias("band")
    )
    return (
        o.groupBy(band)
        .agg(
            F.count("*").alias("n"),
            dsum("o_totalprice", "sum_price"),
            F.sum(dec2(F.least(F.col("o_totalprice"), F.lit(100000.0))))
            .cast("double")
            .alias("sum_capped"),
            (F.count("*") - F.count(F.nullif(F.col("o_orderstatus"), F.lit("O"))))
            .alias("n_open"),
            F.sum(dec2(F.greatest(F.col("o_totalprice"), F.lit(1000.0))))
            .cast("double")
            .alias("sum_floored"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# pivot (cross-tab) — guide's pivot/unpivot pattern
# ---------------------------------------------------------------------------


@register(
    "q29_pivot",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT)
             AS p1_urgent,
           CAST(COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT)
             AS p2_high,
           CAST(COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT)
             AS p3_medium,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN
                    ('1-URGENT','2-HIGH','3-MEDIUM') THEN 1 ELSE 0 END) AS BIGINT)
             AS other
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Pivot / cross-tab: order counts by status × priority with "
    "explicit pivot values (one pass, no per-column scans).",
)
def q29(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    known = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.when(F.col("o_orderpriority") == known[0], 1))
            .cast("bigint")
            .alias("p1_urgent"),
            F.count(F.when(F.col("o_orderpriority") == known[1], 1))
            .cast("bigint")
            .alias("p2_high"),
            F.count(F.when(F.col("o_orderpriority") == known[2], 1))
            .cast("bigint")
            .alias("p3_medium"),
            F.sum(F.when(~F.col("o_orderpriority").isin(known), 1).otherwise(0))
            .cast("bigint")
            .alias("other"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# S28 subqueries (scalar + correlated) — Spark SQL surface
# ---------------------------------------------------------------------------

_Q28_SQL = """
WITH tot AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS t
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, CAST(t AS DOUBLE) AS total_val
FROM customer JOIN tot ON c_custkey = o_custkey
WHERE CAST(t AS DOUBLE) >
      (SELECT 2.0 * (CAST(SUM(t) AS DOUBLE) / COUNT(*)) FROM tot)
ORDER BY c_custkey
"""


@register(
    "q28_subquery",
    oracle=_Q28_SQL,
    doc="S28 scalar subquery over a CTE: customers whose exact-decimal "
    "order total exceeds 2× the mean customer total (Catalyst plans the "
    "scalar subquery as a broadcast).",
)
def q28(spark: SparkSession, sf: str) -> DataFrame:
    # Same ANSI text runs on both engines — this is the Spark SQL surface.
    from parquet_demo_spark.catalog import register_views

    register_views(spark, sf)
    return spark.sql(_Q28_SQL)


# ---------------------------------------------------------------------------
# S12b explicit GROUPING SETS (non-hierarchical — not expressible as
# ROLLUP or CUBE subsets without post-filtering)
# ---------------------------------------------------------------------------


@register(
    "q102_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """,
    doc="Explicit GROUPING SETS ((status), (priority)): two disjoint "
    "single-column aggregations in ONE Expand pass over the scan — the "
    "shape ROLLUP/CUBE cannot express without computing and discarding "
    "the combined set. Same one-scan Expand machinery as q12/q36, "
    "driven through the native DataFrame.groupingSets API.",
)
def q102(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_prio"),
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_prio",
            "n",
            "total",
        )
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )
