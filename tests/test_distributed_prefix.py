"""Laws for operators/distributed.range_prefix — the two-pass
distributed prefix scan that replaces unpartitioned windows.

The claim under test: range-partition + local window + offset join is
BIT-IDENTICAL to the single-task global window at any partition count.
The design is single-lineage (the range exchange feeds both the totals
branch and the data branch, deduplicated by exchange reuse) because
RangePartitioner's boundary sampling is RDD-id-seeded: two independent
jobs may split differently, so partition ids must never cross a job
boundary — a dedicated test pins the reuse."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from parquet_demo_spark.operators.distributed import range_prefix
from parquet_demo_spark.plans import physical_plan, single_task_window_count


def _sample(spark, n=5000, groups=0, parts=16):
    df = spark.range(n).repartition(parts).select(
        # scrambled but deterministic order key, non-trivial values
        (F.col("id") * 2654435761 % 1000003).alias("k"),
        F.col("id").alias("id"),
        (F.col("id") % 97 + 1).alias("v"),
        *([(F.col("id") % groups).alias("g")] if groups else []),
    )
    return df


def test_cumsum_matches_global_window(spark):
    df = _sample(spark)
    got = range_prefix(
        df, ["k", "id"], value_col="v", cum_col="cum", row_col="r",
        total_rows_col="n", total_sum_col="s",
    )
    w = W.orderBy("k", "id")
    want = df.select(
        "k",
        "id",
        F.sum("v")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
        F.row_number().over(w).cast("bigint").alias("r"),
    )
    rows = got.collect()
    g = {(r["k"], r["id"]): (r["cum"], r["r"]) for r in rows}
    for row in want.collect():
        assert g[(row["k"], row["id"])] == (row["cum"], row["r"])
    assert all(r["n"] == 5000 for r in rows)
    total = sum(i % 97 + 1 for i in range(5000))
    assert all(r["s"] == total for r in rows)


def test_grouped_cumsum_matches_partitioned_window(spark):
    df = _sample(spark, groups=5)
    got = range_prefix(
        df,
        ["k", "id"],
        group_cols=["g"],
        value_col="v",
        cum_col="cum",
        row_col="r",
        total_rows_col="n",
    )
    w = W.partitionBy("g").orderBy("k", "id")
    want = df.select(
        "g",
        "id",
        F.sum("v")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
        F.row_number().over(w).cast("bigint").alias("r"),
        F.count("*").over(
            W.partitionBy("g").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n"),
    )
    g = {(r["g"], r["id"]): (r["cum"], r["r"], r["n"]) for r in got.collect()}
    for row in want.collect():
        assert g[(row["g"], row["id"])] == (row["cum"], row["r"], row["n"])


def test_range_exchange_is_reused_not_reevaluated(spark):
    """Correctness depends on the totals branch and the data branch
    reading the SAME shuffle output (partition ids are not stable
    across independent evaluations); the plan must dedupe the range
    exchange."""
    df = _sample(spark)
    got = range_prefix(df, ["k", "id"], value_col="v", cum_col="cum")
    plan = physical_plan(got)
    assert plan.count("rangepartitioning") >= 2  # referenced by both branches
    # AQE defers exchange dedup to runtime stage materialization; the
    # FINAL plan must show the reuse
    got.collect()
    final = physical_plan(got)
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final or "ReusedQueryStage" in final, final


def test_more_partitions_than_rows(spark):
    df = _sample(spark, n=7, parts=3)
    got = range_prefix(
        df, ["k", "id"], value_col="v", cum_col="cum", row_col="r",
        num_partitions=64,
    )
    rows = sorted(got.collect(), key=lambda r: r["r"])
    assert [r["r"] for r in rows] == list(range(1, 8))
    run = 0
    for r in rows:
        run += r["v"]
        assert r["cum"] == run


def test_empty_input(spark):
    df = _sample(spark).filter(F.lit(False))
    got = range_prefix(df, ["k", "id"], value_col="v", cum_col="cum")
    assert got.count() == 0


def test_arg_validation(spark):
    df = _sample(spark)
    with pytest.raises(ValueError):
        range_prefix(df, ["k"], cum_col="cum")  # cum without value_col
    with pytest.raises(ValueError):
        range_prefix(df, ["k"])  # nothing requested
    with pytest.raises(ValueError):
        range_prefix(df, ["k"], row_col="r", total_sum_col="s")


def test_plan_has_no_data_sized_global_window(spark):
    """Grouped: zero unpartitioned windows. Ungrouped: exactly one —
    the offsets window over per-partition totals, whose input is
    bounded by the partition count (metadata, not data)."""
    df = _sample(spark, groups=3)
    grouped = range_prefix(
        df, ["k", "id"], group_cols=["g"], value_col="v", cum_col="cum"
    )
    assert single_task_window_count(grouped) == 0
    ungrouped = range_prefix(
        _sample(spark), ["k", "id"], value_col="v", cum_col="cum"
    )
    assert single_task_window_count(ungrouped) == 1
