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
    direction: str = "backward",
    tolerance=None,
    matched_time_col: str | None = None,
) -> DataFrame:
    """Left as-of join: nearest right ``value_col`` per key —
    ``backward`` (latest right_time <= left_time, the default) or
    ``forward`` (earliest right_time >= left_time). Right must be
    unique per (key, right_time).

    ``tolerance`` (a Column interval/numeric delta, e.g.
    ``F.expr("INTERVAL 1 HOUR")``) nulls the match when the matched
    right time is farther than the bound from the left time — pandas
    ``merge_asof(tolerance=...)`` semantics: out-of-tolerance rows
    keep the left row with a null value, they don't disappear.
    ``matched_time_col`` additionally emits the matched right time.

    Both directions are the same one-shuffle union+window plan; forward
    just flips the window frame (first following instead of last
    preceding) and the tie order (left rows sort before right rows at
    equal time, so an equal-time right row is still eligible).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    back = direction == "backward"
    # ties: the right row must fall INSIDE the left row's window frame
    # at equal _t — before it when looking back, after it when forward
    l_tag, r_tag = (1, 0) if back else (0, 1)
    # ONE struct per right row carrying (matched time, value) — value and
    # matched-time must come from the SAME row. Tracking them in separate
    # ignorenulls windows would let a NULL-valued nearest right row leak a
    # FARTHER row's value attributed to the nearest row's time (and check
    # tolerance against the wrong row); pandas merge_asof returns null for
    # that case. The struct itself is non-null for every right row (a
    # struct with a null field is still a non-null struct), so ignorenulls
    # skips exactly the left rows.
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(r_tag).alias("_tag"),
        F.struct(
            F.col(right_time).alias("_mt"), F.col(value_col).alias("_mv")
        ).alias("_rv"),
        F.lit(None).alias("_row"),
    )
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(l_tag).alias("_tag"),
        F.lit(None).cast(rt.schema["_rv"].dataType).alias("_rv"),
        F.struct(*left.columns).alias("_row"),
    )
    rt = rt.withColumn(
        "_row", F.lit(None).cast(lt.schema["_row"].dataType)
    )
    base = W.partitionBy("_k").orderBy("_t", "_tag")
    if back:
        w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
        pick = F.last("_rv", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(W.currentRow, W.unboundedFollowing)
        pick = F.first("_rv", ignorenulls=True).over(w)
    merged = (
        lt.unionByName(rt)
        .select("*", pick.alias("__m"))
        .select(
            "*",
            F.col("__m._mv").alias("__mv"),
            F.col("__m._mt").alias("__mt"),
        )
    )
    if tolerance is not None:
        delta = (
            F.col("_t") - F.col("__mt") if back else F.col("__mt") - F.col("_t")
        )
        within = F.col("__mt").isNotNull() & (delta <= tolerance)
        merged = merged.select(
            "_tag",
            "_row",
            F.when(within, F.col("__mv")).alias("__mv"),
            F.when(within, F.col("__mt")).alias("__mt"),
        )
    outs = [F.col("__mv").alias(out_col)]
    if matched_time_col is not None:
        outs.append(F.col("__mt").alias(matched_time_col))
    return merged.filter(F.col("_tag") == l_tag).select("_row.*", *outs)


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


@register(
    "q148_asof_forward_tolerance",
    oracle="""
    WITH p AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    e AS (
      SELECT user_id, ts,
             MIN(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'error' GROUP BY 1, 2
    ),
    j AS (
      SELECT p.user_id, p.ts, e.ts AS mts, e.cents
      FROM p ASOF LEFT JOIN e
        ON p.user_id = e.user_id AND e.ts >= p.ts
    ),
    t AS (
      SELECT user_id,
             mts IS NOT NULL AND mts - ts <= INTERVAL 1 HOUR AS hit,
             cents
      FROM j
    )
    SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_matched,
           CAST(SUM(CASE WHEN hit THEN cents END) AS BIGINT)
             AS matched_cents
    FROM t GROUP BY 1 ORDER BY 1
    """,
    doc="FORWARD as-of join with a tolerance bound: for each purchase, "
    "the user's NEXT error event (earliest error ts >= purchase ts), "
    "kept only when it lands within 1 hour — the does-X-cause-Y-soon "
    "shape (pandas merge_asof(direction='forward', tolerance=...)). "
    "Same one-shuffle union+window plan as the backward as-of (q33), "
    "with the frame flipped to first-following and equal-time rights "
    "still eligible; out-of-tolerance matches null out rather than "
    "dropping the left row. The oracle is DuckDB's NATIVE forward "
    "ASOF LEFT JOIN (e.ts >= p.ts) — an independent implementation "
    "of the same semantics, so the hash check cross-validates engines, "
    "not a shared formula. Right side pre-aggregates to unique "
    "(user, ts) (MIN cents) for tie determinism on both sides.",
)
def q148(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(
            F.min(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                "cents"
            )
        )
    )
    joined = asof_join(
        purchases,
        errors,
        key="user_id",
        left_time="ts",
        right_time="ts",
        value_col="cents",
        out_col="next_error_cents",
        direction="forward",
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    return (
        joined.groupBy(
            (F.col("user_id") % 10).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum(
                F.when(F.col("next_error_cents").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_matched"),
            F.sum("next_error_cents").cast("bigint").alias("matched_cents"),
        )
        .orderBy("bucket")
    )
