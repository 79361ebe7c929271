"""N× scale check for scatter-write backfills into a partitioned
table: copy-on-write vs merge-on-read children (VERDICT r11 #4).

The workload is the backfill shape the MOR child type exists for: a
fixed-size correction batch whose keys scatter across EVERY partition
(and, inside each child, across every bucket — distinct keys ≫ bucket
count). With COW children each batch rewrites each touched bucket, so
per-batch cost grows with BUCKET size — i.e. with the base table —
at any bucket count. With MOR children each batch is one O(batch)
delta append per touched child; the rewrite is deferred to compact()
(amortized once per cadence).

Measured terms at a fixed layout (8 partitions × 4 buckets; base size
grows with --copies):

- ``bulk load``: one-time table build (plus the MOR fold) — linear by
  design, reported for context.
- ``COW scatter batch``: median of 3 ``merge(batch)`` into the COW
  table — the term that grows with the base.
- ``MOR scatter batch``: median of 3 ``merge(batch)`` into the MOR
  table — the ~flat term.
- ``MOR compact``: one table ``compact()`` after the batches — the
  deferred amortized cost, for honesty (MOR does not make the rewrite
  free, it moves it off the ingest path).

Output parity is asserted: after the batches (and the MOR fold), both
tables' snapshots must be row-identical.

Usage: python scripts/backfill_scale_check.py [--copies N]  (default 1)
Run at 1/10/100 and record the rows in BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from parquet_demo_spark.session import get_spark  # noqa: E402
from parquet_demo_spark.sources.partitioned_store import (  # noqa: E402
    PartitionedParquetMergeStore,
)

ROWS_BASE = 20_000
BATCH_ROWS = 2_000
PARTITIONS = 8
BUCKETS = 4


def _frame(spark, n, start=0, bump=0.0):
    return spark.range(start, start + n).select(
        (F.col("id") % PARTITIONS).cast("string").alias("day"),
        F.col("id").alias("k"),
        F.lit(1).cast("bigint").alias("v"),
        (F.col("id").cast("double") + F.lit(bump)).alias("value"),
    )


def main() -> None:
    copies = 1
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    spark = get_spark()
    base_rows = ROWS_BASE * copies
    base = _frame(spark, base_rows)
    # the scatter batch: keys spread over the whole key domain so
    # distinct keys >> bucket count in every child. The stride is
    # forced ODD (coprime with the power-of-two partition count): an
    # even stride makes k % PARTITIONS collapse onto a subset — at
    # --copies=100 the old even stride hit exactly ONE partition,
    # degenerating the scatter workload the script exists to measure
    # (round-12 review finding)
    stride = max(1, base_rows // BATCH_ROWS) | 1
    batch = _frame(spark, BATCH_ROWS, bump=0.5).withColumn(
        "k", F.col("k") * F.lit(stride)
    ).withColumn("day", (F.col("k") % PARTITIONS).cast("string"))

    stores = {}
    for kind in ("cow", "mor"):
        root = f"/tmp/spark_graft_backfill_{kind}_{copies}"
        if os.path.exists(root):
            shutil.rmtree(root)
        st = PartitionedParquetMergeStore(
            root,
            keys=("day", "k"),
            partition_col="day",
            version_cols=("v",),
            num_buckets=BUCKETS,
            child_store=kind,
        )
        t0 = time.perf_counter()
        st.merge(base)
        if kind == "mor":
            st.compact(spark)  # establish each child's base
        print(f"{kind} bulk load ({base_rows} rows): "
              f"{time.perf_counter() - t0:.2f}s")
        stores[kind] = st

    times = {}
    for kind, st in stores.items():
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            st.merge(batch)
            runs.append(time.perf_counter() - t0)
        times[kind] = statistics.median(runs)
        print(
            f"{kind} scatter batch ({BATCH_ROWS} rows x "
            f"{PARTITIONS} partitions, median of 3): "
            f"{times[kind]:.2f}s  runs={[round(r, 2) for r in runs]}"
        )

    t0 = time.perf_counter()
    stores["mor"].compact(spark)
    print(f"mor compact (deferred fold): {time.perf_counter() - t0:.2f}s")

    a = sorted(
        tuple(r)
        for r in stores["cow"].read(spark).collect()
    )
    b = sorted(
        tuple(r)
        for r in stores["mor"].read(spark).collect()
    )
    assert a == b, "COW and MOR snapshots diverged"
    print(
        f"copies={copies} parity: ok ({len(a)} rows); "
        f"cow/mor batch ratio: {times['cow'] / times['mor']:.2f}x"
    )


if __name__ == "__main__":
    main()
