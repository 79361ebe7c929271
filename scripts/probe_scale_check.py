"""N× scale check for PK-probe point reads (q172/q174, VERDICT r9).

Replicates the sf0.1 events table ×N (scale_check's builder, user_id
offset per copy so key cardinality scales), merges it into a
(user_id, event_type)-keyed store and a week-partitioned store, then
times a FIXED point-lookup-sized (6-key) probe batch three ways:

- **store.probe** (bucket-pruned): collect the keys' bucket ids
  (metadata-sized), open only those dirs, semi-join. Claim: grows with
  the touched buckets' bytes — at fixed num_buckets that is
  (batch buckets / num_buckets) of the table, NOT a full scan; at
  1000× a deployment sizes num_buckets up and the probe stays o(table).
- **full-scan lookup** (the naive alternative): store.read + left-semi
  join. Claim: grows ~linearly with the table — the gap is the
  probe's pruning evidence.
- **partitioned probe** (q174's composition): keys from 2 of the
  weeks open only those children, bucket-pruned inside each.

Usage: python scripts/probe_scale_check.py [--copies N]   (default 10)
Run at 1 and 10 and record the ratios in BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scale_check as sc  # noqa: E402  (sibling script, reused builder)

from pyspark.sql import functions as F  # noqa: E402

from parquet_demo_spark.catalog import load  # noqa: E402
from parquet_demo_spark.session import get_spark  # noqa: E402
from parquet_demo_spark.sources.merge_store import (  # noqa: E402
    ParquetMergeStore,
)
from parquet_demo_spark.sources.partitioned_store import (  # noqa: E402
    PartitionedParquetMergeStore,
)


def _timed(label: str, fn, runs: int = 3) -> float:
    fn()  # warm
    times = sorted(
        (lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(runs)
    )
    med = times[len(times) // 2]
    print(f"{label}: median {med:.2f}s (runs {[f'{t:.2f}' for t in times]})")
    return med


def main() -> None:
    if "--copies" in sys.argv:
        i = sys.argv.index("--copies")
        sc.COPIES = int(sys.argv[i + 1])
    sc.DST = f"/tmp/spark_graft_scale{sc.COPIES}"
    spark = get_spark()
    sc.build("events")
    ev = load(spark, sc.DST, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    print(f"copies={sc.COPIES} rows={ev.count()}")

    root = f"/tmp/spark_graft_probe_scale{sc.COPIES}"
    if os.path.exists(root):
        shutil.rmtree(root)

    store = ParquetMergeStore(
        os.path.join(root, "flat"),
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        # num_buckets sized UP for the probe story: pruning power is
        # (keys' buckets / num_buckets), and a deployment at 100 TB
        # runs thousands of buckets — 64 here keeps a 6-key probe
        # under 10% of the dirs
        num_buckets=64,
    )
    t0 = time.perf_counter()
    store.merge(ev)
    print(f"store build (one-time, linear): {time.perf_counter() - t0:.2f}s")

    # fixed ~500-key batch from copy 0 (present at every N)
    base_span = (
        load(spark, "/root/testdata/sf0.1", "events")
        .agg(F.max("user_id"))
        .collect()[0][0]
        + 1
    )
    # a POINT-lookup-sized batch: 6 deterministic PKs from copy 0 —
    # the probe's claim is about needle reads, not semi-joining a
    # whole table's worth of keys (which touches every bucket anyway)
    keys = (
        ev.filter(
            (F.col("user_id") < base_span) & (F.col("user_id") % 37 == 0)
        )
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type")
        .limit(6)
        .localCheckpoint()
    )
    print(f"probe batch keys={keys.count()}")

    def _probe():
        store.probe(spark, keys).agg(F.count("*")).collect()

    def _full():
        store.read(spark).join(
            keys, ["user_id", "event_type"], "left_semi"
        ).agg(F.count("*")).collect()

    _timed("bucket-pruned probe (fixed key batch)", _probe)
    _timed("full-scan lookup (naive alternative)", _full)

    pstore = PartitionedParquetMergeStore(
        os.path.join(root, "weekly"),
        keys=("wk", "user_id", "event_type"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    evw = ev.select(
        F.date_trunc("week", F.col("ts")).cast("date").cast("string")
        .alias("wk"),
        "user_id",
        "event_type",
        "event_id",
        "ts",
        "value",
    )
    t0 = time.perf_counter()
    pstore.merge(evw)
    print(
        f"partitioned build ({len(pstore.partitions())} weeks): "
        f"{time.perf_counter() - t0:.2f}s"
    )
    wks = pstore.partitions()[1:3]
    pkeys = (
        evw.filter(
            F.col("wk").isin(wks)
            & (F.col("user_id") < base_span)
            & (F.col("user_id") % 37 == 0)
        )
        .select("wk", "user_id", "event_type")
        .distinct()
        .orderBy("wk", "user_id", "event_type")
        .limit(6)
        .localCheckpoint()
    )
    print(f"partitioned probe keys={pkeys.count()} over weeks {wks}")

    def _pprobe():
        pstore.probe(spark, pkeys).agg(F.count("*")).collect()

    _timed("partitioned probe (2 of the weeks, fixed key batch)", _pprobe)


if __name__ == "__main__":
    main()
