"""Multiset set-ops, statistical aggregates, and structured JSON
parsing — the long tail of the relational surface.

Determinism note (q40): corr/stddev are float aggregates whose
parallel-merge order perturbs the last ulps; ROUND(…, 4) absorbs it.
The correctness gate compares both engines on identical sf0.01 data, so
agreement there is exact agreement for the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_demo_spark.catalog import load
from parquet_demo_spark.functions import epoch_us, qround
from parquet_demo_spark.registry import register


@register(
    "q39_multiset_ops",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM
        (SELECT l_partkey FROM lineitem INTERSECT ALL SELECT p_partkey FROM part))
        AS n_intersect_all,
      (SELECT COUNT(*) FROM
        (SELECT l_partkey FROM lineitem EXCEPT ALL SELECT p_partkey FROM part))
        AS n_except_all
    """,
    doc="Multiset (bag) semantics: INTERSECT ALL / EXCEPT ALL keep "
    "duplicate multiplicities — the q16 trio's bag-algebra counterpart.",
)
def q39(spark: SparkSession, sf: str) -> DataFrame:
    lk = load(spark, sf, "lineitem").select(F.col("l_partkey").alias("k"))
    pk = load(spark, sf, "part").select(F.col("p_partkey").alias("k"))
    inter = lk.intersectAll(pk).agg(F.count("*").alias("n_intersect_all"))
    exc = lk.exceptAll(pk).agg(F.count("*").alias("n_except_all"))
    return inter.crossJoin(exc)


@register(
    "q40_stats_aggregates",
    oracle="""
    SELECT o_orderstatus,
           ROUND(stddev_samp(o_totalprice), 4) AS sd_price,
           ROUND(var_samp(o_totalprice), 4) AS var_price,
           ROUND(corr(o_totalprice, o_custkey), 6) AS corr_price_cust,
           ROUND(covar_samp(o_totalprice, o_custkey), 4) AS covar_price_cust
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Statistical aggregates: stddev/variance/correlation/covariance "
    "per group — one-pass mergeable moments (Welford-style partials "
    "merge across partitions; ROUND absorbs merge-order ulps).",
)
def q40(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
            F.round(F.var_samp("o_totalprice"), 4).alias("var_price"),
            F.round(F.corr("o_totalprice", "o_custkey"), 6).alias(
                "corr_price_cust"
            ),
            F.round(F.covar_samp("o_totalprice", "o_custkey"), 4).alias(
                "covar_price_cust"
            ),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q41_from_json_struct",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    GROUP BY k ORDER BY n DESC, k LIMIT 20
    """,
    doc="S22 structured parse: from_json(props) into a typed struct "
    "column (schema'd parse once, then ordinary column pruning — the "
    "scale answer to repeated get_json_object calls on the same blob).",
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = e.withColumn("p", F.from_json("props", schema))
    return (
        parsed.select(F.col("p.k").alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "k")
        .limit(20)
    )


@register(
    "q67_sessionize_batch",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
    doc="Batch sessionization (lag + gap-flag + sum): the batch twin of "
    "q62's streaming session_window — same 30-minute gap semantics, "
    "one window pass instead of a state store.",
)
def q67(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # exact µs arithmetic (a seconds-granularity cast would truncate
    # fractional-second gaps and disagree with the oracle's interval
    # comparison at the 30-minute boundary)
    us = epoch_us("ts")
    gap = us - F.lag(us).over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "q68_exact_percentiles",
    oracle="""
    SELECT o_orderstatus,
           FLOOR(quantile_cont(o_totalprice, 0.5) * 100 + 0.5) / 100 AS p50,
           FLOOR(quantile_cont(o_totalprice, 0.9) * 100 + 0.5) / 100 AS p90,
           FLOOR(quantile_cont(o_totalprice, 0.99) * 100 + 0.5) / 100 AS p99
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Exact (interpolated) percentiles per group — the exact twin of "
    "q59b's sketch quantiles; both engines use linear interpolation on "
    "the sorted group. All three cuts come from ONE percentile(array) "
    "call so the group's value buffer is built once, not per-quantile.",
)
def q68(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    pct = F.percentile(
        "o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    )
    return (
        o.groupBy("o_orderstatus")
        .agg(
            qround(pct.getItem(0), 2).alias("p50"),
            qround(pct.getItem(1), 2).alias("p90"),
            qround(pct.getItem(2), 2).alias("p99"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q75_unpivot",
    oracle="""
    WITH wide AS (
      SELECT o_orderstatus,
             COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1_urgent,
             COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2_high
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, prio, CAST(n AS BIGINT) AS n FROM (
      SELECT o_orderstatus, 'p1_urgent' AS prio, p1_urgent AS n FROM wide
      UNION ALL
      SELECT o_orderstatus, 'p2_high' AS prio, p2_high AS n FROM wide)
    ORDER BY o_orderstatus, prio
    """,
    doc="Unpivot (melt): wide per-priority counts back to long form via "
    "stack() — one Generate pass, the inverse of q29's pivot.",
)
def q75(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias(
            "p1_urgent"
        ),
        F.count(F.when(F.col("o_orderpriority") == "2-HIGH", 1)).alias(
            "p2_high"
        ),
    )
    return (
        wide.selectExpr(
            "o_orderstatus",
            "stack(2, 'p1_urgent', p1_urgent, 'p2_high', p2_high) AS (prio, n)",
        )
        .select("o_orderstatus", "prio", F.col("n").cast("bigint").alias("n"))
        .orderBy("o_orderstatus", "prio")
    )


@register(
    "q72_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(FLOOR(o_totalprice)) AS BIGINT) AS lo,
           CAST(MAX(FLOOR(o_totalprice)) AS BIGINT) AS hi
    FROM orders GROUP BY bucket ORDER BY bucket
    """,
    doc="Fixed-width histogram binning (floor-division buckets): the "
    "one-pass distribution profile; bucket arithmetic is exact so the "
    "bins are engine-independent.",
)
def q72(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    bucket = F.floor(F.col("o_totalprice") / 25000.0).cast("bigint")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min(F.floor("o_totalprice")).cast("bigint").alias("lo"),
            F.max(F.floor("o_totalprice")).cast("bigint").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "q73_null_safe_join",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS s FROM orders
      WHERE o_orderkey < 1000
    )
    SELECT COUNT(*) AS n_pairs,
           COUNT(CASE WHEN a_s IS NULL THEN 1 END) AS n_null_key_pairs
    FROM (
      SELECT a.s AS a_s FROM t a JOIN t b
        ON a.s IS NOT DISTINCT FROM b.s AND a.o_orderkey < b.o_orderkey)
    """,
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other — Catalyst still plans a hash join on the "
    "null-safe key (nulls form one hash group) instead of falling back "
    "to nested-loop.",
)
def q73(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").filter(F.col("o_orderkey") < 1000)
    t = o.select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("s")
    )
    a = t.alias("a")
    b = t.alias("b")
    pairs = a.join(
        b,
        F.col("a.s").eqNullSafe(F.col("b.s"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
    ).select(F.col("a.s").alias("a_s"))
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.count(F.when(F.col("a_s").isNull(), 1)).alias("n_null_key_pairs"),
    )


@register(
    "q74_vocab_by_source",
    oracle="""
    SELECT source,
           COUNT(DISTINCT doc_id) AS n_docs,
           CAST(COUNT(DISTINCT token) AS BIGINT) AS vocab,
           COUNT(*) AS n_token_rows
    FROM (
      SELECT source, doc_id,
             unnest(list_distinct(list_filter(
               string_split_regex(lower(text), '[^a-z]+'), t -> t <> ''))) AS token
      FROM documents)
    GROUP BY source ORDER BY source
    """,
    doc="Per-source vocabulary profile (distinct tokens per corpus "
    "slice): the corpus-diversity signal; in-row distinct before the "
    "explode keeps the shuffle at vocab size.",
)
def q74(spark: SparkSession, sf: str) -> DataFrame:
    from parquet_demo_spark.functions import tokens

    docs = load(spark, sf, "documents")
    tok = docs.select(
        "source",
        "doc_id",
        F.explode(
            F.array_distinct(F.filter(tokens("text"), lambda t: t != ""))
        ).alias("token"),
    )
    return (
        tok.groupBy("source")
        .agg(
            F.count("*").alias("n_token_rows_tmp"),
            F.countDistinct("token").cast("bigint").alias("vocab"),
            F.countDistinct("doc_id").alias("n_docs_tmp"),
        )
        .select(
            "source",
            F.col("n_docs_tmp").alias("n_docs"),
            "vocab",
            F.col("n_token_rows_tmp").alias("n_token_rows"),
        )
        .orderBy("source")
    )


@register(
    "q42_map_funcs",
    oracle="""
    SELECT json_keys(props)[1] AS first_key,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MAX(len(json_keys(props))) AS BIGINT) AS max_n_keys
    FROM events
    GROUP BY first_key ORDER BY first_key
    """,
    doc="S22 map surface: from_json into map<string,bigint>, then "
    "map_keys/element_at — the schemaless twin of q41's struct parse "
    "(map parsing keeps unknown keys; struct parsing prunes to declared "
    "fields).",
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    parsed = e.withColumn(
        "m", F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    )
    return (
        parsed.select(
            F.element_at(F.map_keys("m"), 1).alias("first_key"),
            F.element_at(F.col("m"), "k").alias("k_val"),
            F.size(F.map_keys("m")).alias("n_keys"),
        )
        .groupBy("first_key")
        .agg(
            F.count("*").alias("n"),
            F.sum("k_val").cast("bigint").alias("sum_k"),
            F.max("n_keys").cast("bigint").alias("max_n_keys"),
        )
        .orderBy("first_key")
    )
