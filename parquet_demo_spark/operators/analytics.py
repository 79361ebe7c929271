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
from parquet_demo_spark.functions import DEC, dec2, epoch_us, qround
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
        .orderBy(epoch_us("ts"))
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


# ---------------------------------------------------------------------------
# q97 — TPC-H Q14 shape: promotion revenue share
# ---------------------------------------------------------------------------


@register(
    "q97_promo_revenue",
    oracle="""
    SELECT FLOOR(100.0 *
             CAST(SUM(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           * 1000000 + 0.5) / 1000000 AS promo_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: PROMO revenue share for one ship month. The "
    "date band prunes at the scan (PushedFilters on l_shipdate); part "
    "broadcasts; the conditional revenue is ONE pass of two exact-"
    "decimal sums with the ratio rendered as a rounded double.",
)
def q97(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf, "part")
    one = F.lit(1).cast(DEC)
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    zero = F.lit(0).cast(DEC)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            qround(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                .cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_pct"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q98 — TPC-H Q19 shape: disjunctive predicate join
# ---------------------------------------------------------------------------


@register(
    "q98_disjunctive_pred",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#16' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 25 AND 45)
    """,
    doc="TPC-H Q19 shape: OR-of-ANDs predicate across both join sides. "
    "Catalyst CNF-converts the disjunction to push the derivable "
    "single-side filters (p_brand IN (...), p_size/l_quantity range "
    "unions) below the join, keeping only the cross-side residual on "
    "the join — the scan never reads rows outside the brand/size "
    "envelope. part broadcasts.",
)
def q98(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & q.between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(10, 30)
            & q.between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#16")
            & F.col("p_size").between(20, 50)
            & q.between(25, 45)
        )
    )
    one = F.lit(1).cast(DEC)
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    return j.filter(cond).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# q99 — TPC-H Q16 shape: supplier diversity per part profile
# ---------------------------------------------------------------------------


@register(
    "q99_supplier_part_profile",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#4'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 20
    """,
    doc="TPC-H Q16 shape: distinct supplier count per (brand, type, "
    "size) profile, excluding one brand/type and blacklisted suppliers. "
    "The NOT IN subquery becomes a broadcast anti-join (s_suppkey is "
    "non-null, so NOT IN ≡ NOT EXISTS); part filters push to its scan; "
    "lineitem acts as the partsupp link. countDistinct shuffles only "
    "(profile, suppkey) pairs after map-side dedup.",
)
def q99(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    li = load(spark, sf, "lineitem")
    bad = load(spark, sf, "supplier").filter(F.col("s_acctbal") < 0)
    li_ok = li.join(
        F.broadcast(bad),
        li.l_suppkey == bad.s_suppkey,
        "left_anti",
    )
    return (
        li_ok.join(F.broadcast(p), li_ok.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q100 — TPC-H Q22 shape: dormant high-balance customers
# ---------------------------------------------------------------------------


@register(
    "q100_dormant_customers",
    oracle="""
    WITH thresh AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    CROSS JOIN thresh
    WHERE CAST(c_acctbal AS DOUBLE) > avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n_name ORDER BY n_name
    """,
    doc="TPC-H Q22 shape: customers with above-average balance and no "
    "recent orders, tallied per nation. The scalar average is a 1-row "
    "broadcast (decimal sum / count in double — both engines compute "
    "the identical IEEE value); recent-order exclusion is an anti-join "
    "whose build side is only the date-filtered distinct custkeys; "
    "nation broadcasts.",
)
def q100(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    recent = (
        load(spark, sf, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    thresh = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(dec2("c_acctbal")).cast("double")
                / F.count("*").cast("double")
            ).alias("avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal").cast("double") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec2("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q106 — TPC-H Q2 shape: cheapest supplier per part (correlated argmin)
# ---------------------------------------------------------------------------


@register(
    "q106_cheapest_supplier",
    oracle="""
    SELECT p_partkey, p_name, best_price, s_name FROM (
      SELECT l_partkey AS p_partkey, l_extendedprice AS best_price,
             l_suppkey,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY l_extendedprice, l_suppkey) AS rn
      FROM lineitem)
    JOIN part USING (p_partkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE rn = 1 AND p_size = 10
    ORDER BY p_partkey
    """,
    doc="TPC-H Q2 shape: the correlated 'supplier with the minimum "
    "price per part' subquery, expressed as a per-group argmin. Spark "
    "side uses min(struct(price, suppkey)) — a lexicographic struct-min "
    "that is ONE map-side-combining aggregation (no window sort-shuffle "
    "of the fact table) and deterministic under price ties, unlike "
    "min_by; the oracle's ROW_NUMBER ... ORDER BY price, suppkey "
    "implements the identical tie-break. Dimension joins broadcast "
    "after the aggregation has already collapsed the fact side.",
)
def q106(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(F.col("p_size") == 10)
    s = load(spark, sf, "supplier")
    best = (
        li.groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.min(
                F.struct(F.col("l_extendedprice"), F.col("l_suppkey"))
            ).alias("m")
        )
        .select(
            "p_partkey",
            F.col("m.l_extendedprice").alias("best_price"),
            F.col("m.l_suppkey").alias("l_suppkey"),
        )
    )
    return (
        best.join(F.broadcast(p), "p_partkey")
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "best_price", "s_name")
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# q107 — percent-of-total (ratio_to_report) without a global window
# ---------------------------------------------------------------------------


@register(
    "q107_revenue_share",
    oracle="""
    WITH per AS (
      SELECT o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_orderpriority
    ),
    tot AS (SELECT SUM(revenue) AS t FROM per)
    SELECT o_orderpriority, revenue, n_orders,
           FLOOR(revenue / t * 1000000 + 0.5) / 1000000 AS share
    FROM per CROSS JOIN tot
    ORDER BY o_orderpriority
    """,
    doc="Percent-of-total per order priority. The textbook form is "
    "SUM(x) OVER () — an UNPARTITIONED window that funnels every row "
    "through one task and dies at scale. The scale-correct plan: "
    "aggregate per group first (map-side combined), total the tiny "
    "per-group result, broadcast the 1-row total back. The grand total "
    "merges only the handful of per-group doubles (identical across "
    "engines); partition-order wobble in that sum is bounded by a few "
    "ulp (~1e-16 relative), invisible at the 6-dp rounding of the "
    "share.",
)
def q107(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    per = o.groupBy("o_orderpriority").agg(
        F.sum(dec2("o_totalprice")).cast("double").alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    tot = per.agg(F.sum("revenue").alias("t"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "o_orderpriority",
            "revenue",
            "n_orders",
            qround(F.col("revenue") / F.col("t"), 6).alias("share"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q109 — TPC-H Q13 shape: customer order-count distribution
# ---------------------------------------------------------------------------


@register(
    "q109_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: the distribution of per-customer order counts "
    "(excluding one priority class) — two stacked aggregations where "
    "the second one's input is already customer-sized. The LEFT join "
    "keeps zero-order customers (COUNT(o_orderkey) counts matches, not "
    "rows, so they tally as 0); the join predicate's non-key filter "
    "stays in the join condition, NOT the WHERE clause — pushing it to "
    "WHERE would silently drop the zero-order bucket.",
)
def q109(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# q110 — TPC-H Q17 shape: small-quantity-order revenue
# ---------------------------------------------------------------------------


@register(
    "q110_small_qty_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey AS ak, AVG(CAST(l_quantity AS DOUBLE)) AS aq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    JOIN avg_qty ON l_partkey = ak
    WHERE p_brand = 'Brand#4'
      AND CAST(l_quantity AS DOUBLE) < 0.4 * aq
    """,
    doc="TPC-H Q17 shape: items ordered below 40% of their part's "
    "average quantity. The correlated AVG subquery becomes a per-part "
    "pre-aggregation joined back to the fact (shuffle on l_partkey "
    "shared by both sides). The comparison threshold is AVG in DOUBLE: "
    "l_quantity values are small integers stored as doubles, so "
    "sum/count division is the identical IEEE op in both engines, and "
    "a strict < against 0.4*aq only flips if the product is EXACTLY "
    "equal — impossible for 0.4 (not binary-representable) times a "
    "nonzero quotient of integers.",
)
def q110(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(F.col("p_brand") == "Brand#4")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg(F.col("l_quantity").cast("double")).alias("aq")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty.ak)
        .filter(
            F.col("l_quantity").cast("double") < 0.4 * F.col("aq")
        )
        .agg(
            F.sum(dec2("l_extendedprice")).cast("double").alias(
                "total_price"
            ),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q111 — TPC-H Q8 shape: market share by year
# ---------------------------------------------------------------------------


@register(
    "q111_market_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           FLOOR(
             CAST(SUM(CASE WHEN n_name = 'CHINA'
                      THEN CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mkt_share,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's share of supplier revenue per "
    "order year — conditional exact-decimal sums in ONE pass (no "
    "per-nation re-scan), the share a qround-quantized ratio. supplier "
    "and nation broadcast; lineitem⋈orders is the only shuffle.",
)
def q111(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    one = F.lit(1).cast(DEC)
    zero = F.lit(0).cast(DEC)
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    china = F.when(F.col("n_name") == "CHINA", rev).otherwise(zero)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(
            qround(
                F.sum(china).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share"),
            F.count("*").alias("n_items"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q114 — TPC-H Q4 shape: order-priority checking (EXISTS semi-join)
# ---------------------------------------------------------------------------


@register(
    "q114_priority_late_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL '80 days')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: orders in a quarter with at least one line "
    "shipped more than 80 days after ordering (the fixture has no "
    "commit/receipt dates, so ship-lag stands in), counted per "
    "priority. EXISTS plans as a LEFT SEMI join — each order matches at "
    "most once no matter how many late lines it has; the date band "
    "prunes the orders scan first.",
)
def q114(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 80 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q115 — TPC-H Q6 shape: forecast revenue change (pure filter-aggregate)
# ---------------------------------------------------------------------------


@register(
    "q115_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue_delta,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: the what-if discount-removal revenue — a pure "
    "filter-aggregate with EVERY predicate pushed to the parquet scan "
    "(date band, discount band, quantity cap: all show in "
    "PushedFilters) and no join or shuffle beyond the 1-row partial "
    "merge. The canary query for scan efficiency at 100 TB.",
)
def q115(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec2("l_extendedprice") * dec2("l_discount"))
            .cast("double")
            .alias("revenue_delta"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q116 — TPC-H Q10 shape: returned-item revenue per customer
# ---------------------------------------------------------------------------


@register(
    "q116_returned_revenue",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by revenue lost to returns "
    "in a half-year window. The returnflag filter pushes to the "
    "lineitem scan and the date band to orders; customer and nation "
    "broadcast; top-20 is a TakeOrdered heap.",
)
def q116(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    one = F.lit(1).cast(DEC)
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q117 — TPC-H Q15 shape: top supplier by period revenue
# ---------------------------------------------------------------------------


@register(
    "q117_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: the supplier(s) with maximum quarterly "
    "revenue — the view + scalar MAX subquery becomes one per-supplier "
    "pre-aggregation reused for both the ranking and the threshold (a "
    "1-row broadcast), with exact-decimal revenue making the equality "
    "comparison well-defined across engines (double equality on a "
    "decimal-exact value, not an accumulated float).",
)
def q117(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        # explicit: the supplier inner join infers isnotnull(l_suppkey)
        # on the join branch only; filtering it HERE makes both consumers
        # of `rev` (the MAX threshold and the join) canonically identical
        # so AQE materializes the per-supplier aggregation once
        & F.col("l_suppkey").isNotNull()
    )
    s = load(spark, sf, "supplier")
    one = F.lit(1).cast(DEC)
    rev_expr = dec2("l_extendedprice") * (one - dec2("l_discount"))
    rev = li.groupBy("l_suppkey").agg(
        F.sum(rev_expr).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q118 — TPC-H Q7 shape: volume shipping between nation pairs
# ---------------------------------------------------------------------------


@register(
    "q118_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
        OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: trade volume between two nations in both "
    "directions (fixture nations NATION_3/NATION_7), per ship year. "
    "The nation table joins TWICE under "
    "different roles (supplier's vs customer's) — both broadcast; the "
    "symmetric nation-pair disjunction filters after the cheap "
    "broadcast joins while the date band prunes the lineitem scan.",
)
def q118(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    one = F.lit(1).cast(DEC)
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_3")
        & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7")
        & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# q119 — TPC-H Q9 shape: product-line profit by nation and year
# ---------------------------------------------------------------------------


@register(
    "q119_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(0.05 AS DECIMAL(18,2))) AS DOUBLE)
             AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit per supplier nation per year for one "
    "product line. The fixture has no partsupp.ps_supplycost, so cost "
    "is modeled as 5% of retail price x quantity — the exact-decimal "
    "difference keeps the aggregation order-independent. p_name LIKE "
    "prunes part FIRST (broadcast), so the fact join only sees the "
    "matching product line.",
)
def q119(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(F.col("p_name").like("%bolt%"))
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    o = load(spark, sf, "orders")
    one = F.lit(1).cast(DEC)
    cost_rate = F.lit(0.05).cast(DEC)
    profit = dec2("l_extendedprice") * (one - dec2("l_discount")) - dec2(
        "p_retailprice"
    ) * dec2("l_quantity") * cost_rate
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# q128 — TPC-H Q11 shape: important supply value (scalar-subquery threshold)
# ---------------------------------------------------------------------------


@register(
    "q128_important_supply_value",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey,
           CAST(val AS DOUBLE) AS supply_value
    FROM v
    WHERE val * 10000 > (SELECT SUM(val) FROM v) * 15
    ORDER BY supply_value DESC, p_partkey
    """,
    doc="TPC-H Q11 shape (no partsupp table in the fixture, so lineitem "
    "is the supply relation): per-part supply value from a 3-nation "
    "supplier bloc, kept when the part holds > 0.15% of the bloc's "
    "total — a grouped aggregate HAVING'd against a scalar subquery of "
    "itself. The threshold compare is decimal-exact on both engines "
    "(val*10000 > total*15 — no floating-point boundary). Plan: dims "
    "broadcast, ONE fact aggregation reused for both the per-part "
    "values and the broadcast scalar total.",
)
def q128(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    one = F.lit(1).cast(DEC)
    val = dec2("l_extendedprice") * (one - dec2("l_discount"))
    bloc = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    per_part = (
        li.join(F.broadcast(bloc), li.l_suppkey == bloc.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("val"))
    )
    total = per_part.agg(F.sum("val").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val") * 10000 > F.col("total") * 15)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("val").cast("double").alias("supply_value"),
        )
        .orderBy(F.col("supply_value").desc(), "p_partkey")
    )


# ---------------------------------------------------------------------------
# q129 — TPC-H Q16 shape: supplier-part relationship profile
# ---------------------------------------------------------------------------


@register(
    "q129_supplier_part_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: how many distinct suppliers can deliver each "
    "(brand, type, size) combination, excluding one brand, a size "
    "list, and a supplier blacklist (negative account balance stands "
    "in for the complaint-comment scan — the fixture has no comments). "
    "Exercises NOT IN as a broadcast anti-join (s_suppkey is non-null, "
    "so anti ≡ NOT IN) feeding a count-distinct aggregate; part is "
    "broadcast, lineitem never shuffles before the distinct.",
)
def q129(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    excl = (
        load(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excl), li.l_suppkey == excl.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


# ---------------------------------------------------------------------------
# q130 — TPC-H Q20 shape: dominant-share suppliers of a part family
# ---------------------------------------------------------------------------


@register(
    "q130_promotion_share_suppliers",
    oracle="""
    WITH qty AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q,
             SUM(SUM(l_quantity)) OVER (PARTITION BY l_partkey) AS t
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red %'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s_name
    FROM qty JOIN supplier ON l_suppkey = s_suppkey
    WHERE q * 2 > t
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape (availqty stands in as shipped quantity — no "
    "partsupp in the fixture): suppliers who shipped more than half of "
    "a 'red' part's 1997 volume. The per-(part, supplier) aggregate "
    "reuses its own shuffle for the per-part total via a window over "
    "the grouped result — one fact shuffle, no self-join — then a "
    "broadcast semi against supplier names. q*2 > t is integer-exact.",
)
def q130(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf, "part").filter(F.col("p_name").like("red %"))
    s = load(spark, sf, "supplier")
    qty = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .withColumn(
            "t", F.sum("q").over(W.partitionBy("l_partkey"))
        )
    )
    dominant = qty.filter(F.col("q") * 2 > F.col("t")).select("l_suppkey")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# q131 — TPC-H Q21 shape: the only-late supplier on multi-supplier orders
# ---------------------------------------------------------------------------


@register(
    "q131_waiting_supplier_orders",
    oracle="""
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL '80 days'
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_orderkey, l_suppkey
    ),
    culprit AS (
      SELECT l_orderkey, l_suppkey,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             SUM(is_late) OVER (PARTITION BY l_orderkey) AS n_late,
             is_late
      FROM per_supp
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM culprit JOIN supplier ON l_suppkey = s_suppkey
    WHERE n_supp >= 2 AND n_late = 1 AND is_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    doc="TPC-H Q21 shape (ship-lag > 80 days after ordering stands in "
    "for receipt-after-commit — the fixture has no commit/receipt "
    "dates, same stand-in as q114): on orders involving ≥2 suppliers "
    "where EXACTLY one was late, count waiting orders per culprit "
    "supplier, top 25. The EXISTS/NOT-EXISTS pair of the original "
    "collapses into window counts over one per-(order, supplier) "
    "aggregate — one fact shuffle instead of two self-joins; supplier "
    "is broadcast; TakeOrderedAndProject caps the result.",
)
def q131(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    s = load(spark, sf, "supplier")
    late = F.max(
        F.when(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS"),
            1,
        ).otherwise(0)
    )
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # one hash(l_orderkey) exchange serves BOTH the (orderkey,
        # suppkey) aggregate (subset clustering) and the per-order
        # window below — without it the agg shuffles on (k, s) and the
        # window re-shuffles on (k): two fact-sized exchanges
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(late.alias("is_late"))
    )
    w = W.partitionBy("l_orderkey")
    culprit = (
        per_supp.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter(
            (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1)
            & (F.col("is_late") == 1)
        )
    )
    return (
        culprit.join(F.broadcast(s), culprit.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )
