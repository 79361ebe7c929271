"""Backfill wall-clock vs touched-partition count (VERDICT r7 #1).

One merge of a FIXED total row count into a PartitionedParquetMergeStore,
varying only how many partitions the batch touches (P = 5, 25, 50). With
the serial write path this costs P sequential Spark-job rounds; with the
thread-pooled path (write_concurrency) the wall should stay near-flat —
each child's merge is an independent directory + commit, and the global
O_EXCL CAS arbitrates once at the end.

Prints per-P wall seconds for the single multi-partition merge and the
ratio vs P=5. Record in BASELINE.md §'Backfill scaling'.

Usage: python scripts/backfill_scale_check.py [--rows N] [--concurrency C]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parquet_demo_spark.session import get_spark
from parquet_demo_spark.sources.partitioned_store import (
    PartitionedParquetMergeStore,
)

ROWS = 200_000
CONCURRENCY = 8
PARTITION_COUNTS = (5, 25, 50)


def main() -> None:
    rows = ROWS
    conc = CONCURRENCY
    args = sys.argv[1:]
    if "--rows" in args:
        rows = int(args[args.index("--rows") + 1])
    if "--concurrency" in args:
        conc = int(args[args.index("--concurrency") + 1])

    spark = get_spark(
        app_name="backfill_scale_check", shuffle_partitions=8
    )
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_backfill_{os.getpid()}"
    )
    # warm-up: one small merge so the first timed P doesn't absorb JVM
    # / codegen warmup
    warm_root = os.path.join(base, "warm")
    shutil.rmtree(warm_root, ignore_errors=True)
    warm = PartitionedParquetMergeStore(
        warm_root,
        keys=("day", "k"),
        partition_col="day",
        version_cols=("v",),
        num_buckets=4,
    )
    warm.merge(
        spark.range(1000).select(
            F.lit("d0").alias("day"),
            F.col("id").alias("k"),
            F.lit(1).cast("long").alias("v"),
            F.col("id").alias("payload"),
        )
    )
    shutil.rmtree(warm_root, ignore_errors=True)
    results = {}
    for n_parts in PARTITION_COUNTS:
        root = os.path.join(base, f"p{n_parts}")
        shutil.rmtree(root, ignore_errors=True)
        store = PartitionedParquetMergeStore(
            root,
            keys=("day", "k"),
            partition_col="day",
            version_cols=("v",),
            num_buckets=4,
            write_concurrency=conc,
        )
        batch = (
            spark.range(rows)
            .select(
                F.concat(
                    F.lit("d"),
                    F.lpad((F.col("id") % n_parts).cast("string"), 3, "0"),
                ).alias("day"),
                F.col("id").alias("k"),
                F.lit(1).cast("long").alias("v"),
                (F.col("id") * 2).alias("payload"),
            )
            .localCheckpoint()  # pin the input: time ONLY the merge
        )
        t0 = time.time()
        store.merge(batch)
        wall = time.time() - t0
        results[n_parts] = wall
        total = store.count_rows()
        print(
            f"P={n_parts:3d}  rows={total}  partitions="
            f"{len(store.partitions())}  wall={wall:6.2f}s",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    p0 = PARTITION_COUNTS[0]
    for n_parts in PARTITION_COUNTS[1:]:
        print(
            f"ratio P={n_parts}/P={p0}: "
            f"{results[n_parts] / results[p0]:.2f}x "
            f"(serial would be ~{n_parts / p0:.0f}x)",
            flush=True,
        )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
