"""Approximate operators S31 (SURVEY §2B): sketch-based cardinality and
quantiles.

HLL/KLL-style sketches are THE 100 TB answer for distinct counts and
percentiles: fixed-size state, one pass, mergeable across partitions —
no shuffle of distinct values. Results are estimator-specific, so these
queries carry no SQL oracle (the driver records a rows-only check);
tests/test_approx.py bounds them against the exact answers (±5%,
SURVEY §2B S31).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.registry import register


@register(
    "q59_approx_distinct",
    oracle=None,  # estimator-specific; bounded vs exact in tests
    doc="S31 approx_count_distinct (HyperLogLog++, rsd=1%): fixed-size "
    "mergeable sketch per partition — the scale path for q11's exact "
    "count-distinct. Both counts aggregate over ONE distinct() pass: "
    "HLL registers are max-based, so duplicates are no-ops and the "
    "sketch over the distinct set is bit-identical to the raw-row "
    "sketch — while mixing countDistinct + approx in a single agg "
    "triggers Catalyst's Expand rewrite that drags the 2^14-register "
    "HLL buffer through the distinct path (measured 3x slower).",
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    # isNotNull keeps countDistinct's null-excluding semantics: after
    # distinct(), count(*) would count a NULL key as one extra customer
    o = (
        load(spark, sf, "orders")
        .filter(F.col("o_custkey").isNotNull())
        .select("o_custkey")
        .distinct()
    )
    return o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_custs"),
        F.count("*").cast("bigint").alias("exact_custs"),
    )


@register(
    "q59b_approx_quantiles",
    oracle=None,
    doc="S31 percentile_approx (KLL-ish sketch) over order totals: "
    "p50/p90/p99 in one mergeable pass. Emitted as three scalar doubles "
    "(not an array column) so the driver's pandas canonicalizer can sort "
    "the result (round-1 q59b ERR was an array-typed output column).",
)
def q59b(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    q = F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000)
    return o.agg(
        q.getItem(0).cast("double").alias("p50"),
        q.getItem(1).cast("double").alias("p90"),
        q.getItem(2).cast("double").alias("p99"),
        F.count("*").alias("n"),
    )
