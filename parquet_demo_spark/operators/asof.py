"""As-of (point-in-time) join — an operator Spark has no native form of.

Semantics: for each left row, attach the value of the most recent right
row with the same key and right_time <= left_time (the time-series /
feature-store lookup join).

Implementation is the union+window composition, NOT a range join:

1. union the two sides with a tag (right=0, left=1), carrying the
   right side's value columns (null on left rows);
2. one window per key ordered by (time, tag): ``last(value, ignorenulls)
   over rows unbounded preceding`` — right rows at the same timestamp
   sort before left rows, so ties resolve to "inclusive as-of";
3. keep the left rows.

Cost at scale: ONE shuffle (hash by key) + a per-partition sort — the
same price as a regular sort-merge join, regardless of how far back the
as-of lookup has to reach. The naive inequality-join formulation
(l ⋈ r ON key AND r.t <= l.t, then argmax) explodes to the full
history per left row; this never materializes more than left+right rows.

The right side must be unique per (key, time) for determinism — callers
pre-aggregate (q33 takes MAX(value) per key/ts in exact cents).
DuckDB's native ASOF JOIN is the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """Left as-of join: latest right ``value_col`` with right_time <=
    left_time per key. Right must be unique per (key, right_time)."""
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(right.schema[value_col].dataType).alias("_v"),
        F.struct(*left.columns).alias("_row"),
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        F.col(value_col).alias("_v"),
        F.lit(None)
        .cast(lt.schema["_row"].dataType)
        .alias("_row"),
    )
    w = (
        W.partitionBy("_k")
        .orderBy("_t", "_tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = lt.unionByName(rt).withColumn(
        out_col, F.last("_v", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_tag") == 1).select("_row.*", out_col)
    return out


@register(
    "q33_asof_join",
    oracle="""
    WITH ev AS (
      SELECT user_id % 100 AS k, ts,
             MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) AS v_cents
      FROM events GROUP BY user_id % 100, ts
    ),
    j AS (
      SELECT o.o_orderkey, ev.v_cents
      FROM (SELECT o_orderkey, o_custkey % 100 AS k, o_orderdate FROM orders) o
      ASOF LEFT JOIN ev ON o.k = ev.k AND o.o_orderdate >= ev.ts
    )
    SELECT COUNT(*) AS n_orders,
           COUNT(v_cents) AS n_matched,
           CAST(SUM(COALESCE(v_cents, 0)) AS BIGINT) AS sum_matched_cents
    FROM j
    """,
    doc="As-of join (union+window composition — one shuffle, no range "
    "explosion): each order picks up the latest event value (exact "
    "cents) at-or-before its order date on a shared bucket key; oracle "
    "is DuckDB's native ASOF JOIN.",
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    # unify timestamp flavors for the union (o_orderdate is NTZ from
    # parquet inference; ts comes via timestamp_micros) — UTC session
    # makes the cast value-preserving
    orders = load(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 100).alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
    )
    events = (
        load(spark, sf, "events")
        .groupBy(
            (F.col("user_id") % 100).alias("k"),
            F.col("ts"),
        )
        .agg(
            F.max(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                "v_cents"
            )
        )
    )
    joined = asof_join(
        orders,
        events,
        key="k",
        left_time="o_orderdate",
        right_time="ts",
        value_col="v_cents",
        out_col="v_cents",
    )
    return joined.agg(
        F.count("*").alias("n_orders"),
        F.count("v_cents").alias("n_matched"),
        F.sum(F.coalesce(F.col("v_cents"), F.lit(0)))
        .cast("bigint")
        .alias("sum_matched_cents"),
    )
