"""Distributed order-statistics primitives: exact global running sums
and ranks WITHOUT a single-task window over the data.

An unpartitioned ``Window.orderBy`` is the classic laptop-to-cluster
trap: Spark plans it as ``Exchange SinglePartition`` + Window, so every
row serializes through ONE task — fine at sf0.1, wrong at 100 TB. The
same answer distributes as the textbook two-pass prefix scan (MPI's
exscan; "per-partition partials + an offset broadcast" in MapReduce
lore):

1. ``repartitionByRange`` on (group cols + order cols): partition *i*
   holds a contiguous slice of the global sort order, and ascending
   ``spark_partition_id`` walks the order (RangePartitioner assigns
   ranges in ascending id order). Unique order keys mean no key
   straddles a boundary.
2. A window partitioned by (partition id, group cols) computes the
   LOCAL running sum / row number — one independent task per
   partition, never a global funnel.
3. Per-(partition, group) totals — ``partitions × groups`` rows,
   metadata-sized at any data scale — get their exclusive prefix
   offsets from a window ORDERED BY partition id over that tiny set,
   and are broadcast-joined back: global value = local value + offset.

Everything happens in ONE query lineage: the range exchange feeds both
the totals branch and the data branch, so Catalyst's exchange reuse
(`ReusedExchange`, on by default; AQE reuses the materialized stage)
evaluates the shuffle exactly once and both branches see the SAME
partition assignment. This is load-bearing for correctness, not just
speed: RangePartitioner's boundary sampling is seeded with the RDD id,
so two *independent* jobs may split differently — which is why this
helper never collects partition ids to the driver and a law test
asserts the reuse. The result is bit-identical to the single-task
window (same total order, exact arithmetic), so hash-checked queries
keep their hashes while every data-sized stage stays parallel.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["range_prefix"]


def range_prefix(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    group_cols: Sequence[str] = (),
    value_col: str | None = None,
    cum_col: str | None = None,
    row_col: str | None = None,
    total_rows_col: str | None = None,
    total_sum_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact distributed prefix aggregation over a total order.

    Adds to ``df`` (per ``group_cols`` partition, ordered by
    ``order_cols`` ascending):

    - ``cum_col``: inclusive running sum of ``value_col``;
    - ``row_col``: 1-based row number (bigint);
    - ``total_rows_col`` / ``total_sum_col``: the group's total row
      count (bigint) / ``value_col`` sum on every row — already known
      from the offset pass, so callers needing totals (ntile bucket
      math, budget checks) pay no extra job.

    ``order_cols`` must be a UNIQUE total order within each group
    (standard for every hash-checked query — ties would make any
    row_number engine-dependent anyway). Group values must be non-null
    (they ride a join key).

    Plan shape note: the offset window runs over the per-partition
    totals — bounded by ``num_partitions × groups`` rows regardless of
    data volume. With ``group_cols`` it is partitioned by group; the
    ungrouped variant is the one DOCUMENTED bounded-input global
    window (input rows = partition count, never data).
    """
    order_cols = list(order_cols)
    group_cols = list(group_cols)
    if cum_col is not None and value_col is None:
        raise ValueError("cum_col requires value_col")
    if total_sum_col is not None and value_col is None:
        raise ValueError("total_sum_col requires value_col")
    if cum_col is None and row_col is None:
        raise ValueError("nothing to compute: set cum_col and/or row_col")

    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    part = df.repartitionByRange(
        n_part, *[F.col(c) for c in group_cols + order_cols]
    ).withColumn("__pid", F.spark_partition_id())

    aggs = [F.count("*").alias("__cnt")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("__sum"))
    totals = part.groupBy("__pid", *group_cols).agg(*aggs)

    wo = W.partitionBy(*group_cols).orderBy("__pid")
    excl = wo.rowsBetween(W.unboundedPreceding, -1)
    full = wo.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    off_cols = [
        F.col("__pid"),
        *[F.col(c) for c in group_cols],
        F.coalesce(F.sum("__cnt").over(excl), F.lit(0)).alias("__ocnt"),
    ]
    if value_col is not None:
        zero = F.lit(0).cast(totals.schema["__sum"].dataType)
        off_cols.append(
            F.coalesce(F.sum("__sum").over(excl), zero).alias("__osum")
        )
    if total_rows_col is not None:
        off_cols.append(
            F.sum("__cnt").over(full).cast("bigint").alias(total_rows_col)
        )
    if total_sum_col is not None:
        off_cols.append(F.sum("__sum").over(full).alias(total_sum_col))
    off = totals.select(*off_cols)

    w = W.partitionBy("__pid", *group_cols).orderBy(*order_cols)
    out = part.join(F.broadcast(off), ["__pid", *group_cols])
    if cum_col is not None:
        out = out.withColumn(
            cum_col, F.sum(value_col).over(w) + F.col("__osum")
        )
    if row_col is not None:
        out = out.withColumn(
            row_col,
            (F.row_number().over(w) + F.col("__ocnt")).cast("bigint"),
        )
    drop = ["__pid", "__ocnt"] + (["__osum"] if value_col is not None else [])
    return out.drop(*drop)
