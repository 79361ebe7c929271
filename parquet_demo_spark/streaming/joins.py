"""Stream-stream joins (S29 extension): watermarked interval joins.

Structured Streaming's stream-stream inner join buffers both sides in
state and emits matches as they arrive; the watermark plus the
time-range join condition bound how long each side's rows are retained
(state for a click is dropped once the watermark passes
click.ts + 30 minutes — without the range condition, state would grow
forever). This is the conversion-attribution shape: purchases joined to
the clicks that preceded them within an attribution window.

Batch-stream equivalence: an INNER join emits every match regardless of
watermark progress (the watermark only gates state *cleanup* and — for
outer joins — null emission), so with a finite fixture the streamed
result equals the batch interval join exactly, which is the DuckDB
oracle here.

Scale posture: both sides shuffle on user_id (the equi-key); state per
key is bounded by the 30-minute window; the memory sink holds only the
matched-pair aggregate's input, and the returned result is the compact
per-user tally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_demo_spark.functions import dsum
from parquet_demo_spark.registry import register
from parquet_demo_spark.streaming.windows import (
    _run_to_memory,
    read_events_stream,
)


@register(
    "q86_stream_stream_join",
    oracle="""
    SELECT c.user_id,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT c.event_id) AS n_clicks_converted
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
    GROUP BY c.user_id ORDER BY c.user_id
    """,
    doc="S29 stream-stream inner interval join: purchases attributed to "
    "clicks by the same user within 30 minutes, both sides watermarked "
    "(1h) so join state is evicted once a click's attribution window "
    "closes. Append-mode memory sink captures the matched pairs; the "
    "returned result is the per-user conversion tally, hash-checked "
    "against the batch interval-join oracle.",
)
def q86(spark: SparkSession, sf: str) -> DataFrame:
    # both sides derive from ONE stream source (streaming self-join):
    # the events file is scanned once per micro-batch, not once per side
    ev = read_events_stream(spark, sf)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    pairs = clicks.join(
        purchases,
        F.expr(
            """
            c_user = p_user
            AND p_ts >= c_ts
            AND p_ts <= c_ts + INTERVAL 30 MINUTES
            """
        ),
    )
    out = _run_to_memory(pairs, "q86_mem", mode="append")
    return (
        out.groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("c_id").alias("n_clicks_converted"),
        )
        .orderBy("user_id")
    )


@register(
    "q133_stream_stream_left_outer",
    oracle="""
    WITH wm AS (
      -- the GLOBAL watermark is the min over both inputs of (that
      -- side's own max event time - its delay): each withWatermark
      -- tracks the maximum the operator itself has seen
      SELECT LEAST(
        (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
        (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')
      ) - INTERVAL '1 hour' AS m
    ),
    j AS (
      SELECT c.user_id, c.ts AS c_ts, p.event_id AS p_id
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN p_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pairs,
           CAST(SUM(CASE WHEN p_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unconverted
    FROM j, wm
    WHERE p_id IS NOT NULL
       OR c_ts + INTERVAL '30 minutes' < m
    GROUP BY user_id ORDER BY user_id
    """,
    doc="S29 stream-stream LEFT OUTER interval join — the operator whose "
    "semantics differ from batch: matches emit as they arrive, but an "
    "UNMATCHED click emits its null-extended row only when the "
    "watermark proves no purchase can still arrive (watermark passes "
    "c_ts + the 30-minute join window). The oracle encodes that "
    "emission law exactly — unmatched clicks qualify iff "
    "c_ts + 30min < max(ts) - 1h (the final watermark under the 1h "
    "delay) — so the hash check verifies Spark's state-eviction/"
    "null-emission behavior itself, not just the matched pairs — "
    "including that the GLOBAL watermark is the min over both sides of "
    "each side's own max event time minus its delay (verified: the "
    "all-events max is wrong at sf0.001/sf0.1). At sf0.01, 1,981 of "
    "1,983 batch-unmatched clicks emit; the tail inside the final "
    "watermark window is correctly withheld.",
)
def q133(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_events_stream(spark, sf)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    pairs = clicks.join(
        purchases,
        F.expr(
            """
            c_user = p_user
            AND p_ts >= c_ts
            AND p_ts <= c_ts + INTERVAL 30 MINUTES
            """
        ),
        "leftOuter",
    )
    out = _run_to_memory(pairs, "q133_mem", mode="append")
    return (
        out.groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.sum(
                F.when(F.col("p_id").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_pairs"),
            F.sum(F.when(F.col("p_id").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unconverted"),
        )
        .orderBy("user_id")
    )


@register(
    "q87_stream_dedup",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    doc="S30 streaming deduplication: the event stream unioned with a "
    "duplicate of itself (at-least-once delivery simulated), then "
    "dropDuplicatesWithinWatermark(event_id) — state for an id is "
    "evicted once the watermark passes its event time, so dedup state is "
    "bounded by the 1h delay instead of growing with the stream. The "
    "deduped append output equals the original events exactly, so the "
    "batch oracle is a plain per-type profile of the source.",
)
def q87(spark: SparkSession, sf: str) -> DataFrame:
    doubled = read_events_stream(spark, sf).unionByName(
        read_events_stream(spark, sf)
    )
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type", "user_id")
    )
    out = _run_to_memory(deduped, "q87_mem", mode="append")
    return (
        out.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


@register(
    "q105_stream_static_join",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS wstart,
           c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY wstart, c_mktsegment
    ORDER BY wstart, c_mktsegment
    """,
    doc="S29 stream-static enrichment join — the production shape for "
    "dimension lookup on a stream: each micro-batch joins the event "
    "stream against the static customer table (broadcast — the stream "
    "side never shuffles for the join), then windows per market "
    "segment. Stream-static joins are stateless (no watermark state on "
    "the static side; the dimension is re-resolvable per batch, which "
    "is also what makes slowly-changing dimensions pick up updates "
    "between batches). Hash-checked against the batch join twin.",
)
def q105(spark: SparkSession, sf: str) -> DataFrame:
    from parquet_demo_spark.catalog import load

    ev = read_events_stream(spark, sf)
    cust = load(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    enriched = ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey
    )
    agg = (
        enriched.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
    )
    out = _run_to_memory(agg, "q105_mem")
    return out.select(
        F.col("w.start").alias("wstart"), "c_mktsegment", "n", "sum_value"
    ).orderBy("wstart", "c_mktsegment")
