"""N× scale check for size-driven bucket provisioning (VERDICT r10 #2).

The round-10 applier tiers measured the one honest growth term in the
COW maintenance path: per-batch merge cost tracks BUCKET size, and at
a FIXED bucket count bucket size grows with the table. `maintain()`
is the provisioning answer — rebucket to the next power of two once
any bucket exceeds a byte target, so buckets ≈ table_bytes / target
and a bounded-key maintenance batch rewrites a bounded number of
bounded-size buckets at ANY table size.

This measures a fixed 20-key update batch (the bounded-key regime the
policy targets — scatter-write batches whose keys ≫ buckets touch
every bucket at any count and are the MergeOnReadStore's domain,
measured flat in BASELINE 'MOR vs COW') against the same data tiered
1×/10×/100×:

- ``fixed 8 buckets``: the round-10 shape — per-batch cost and bytes
  rewritten grow with the table.
- ``policy-provisioned``: `maintain(target_bucket_bytes=512 KiB)`
  first (one amortized rewrite, reported separately), then the same
  batches — bytes rewritten ≈ keys × target, flat.

Both stores must converge to identical snapshots (asserted).

Usage: python scripts/maintain_scale_check.py [--copies N]  (default 1)
Run at 1/10/100 and record the rows in BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquet_demo_spark.session import get_spark  # noqa: E402
from parquet_demo_spark.sources.merge_store import (  # noqa: E402
    ParquetMergeStore,
)

ROWS_BASE = 4_000
TARGET = 512 << 10
N_KEYS = 20
RUNS = 3


def _payload_col():
    # ~1 KiB of incompressible hex per row (md5 chain), built JVM-side
    parts = [
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f"-{j}")))
        for j in range(32)
    ]
    return F.concat(*parts)


def _build(spark, copies):
    return spark.range(ROWS_BASE * copies).select(
        F.col("id").alias("k"),
        F.lit(1).cast("bigint").alias("v"),
        _payload_col().alias("payload"),
    )


def _batch(spark, stamp):
    # the SAME 20 keys at every tier: a bounded-key maintenance batch
    return spark.range(N_KEYS).select(
        (F.col("id") * 97).alias("k"),
        F.lit(stamp).cast("bigint").alias("v"),
        _payload_col().alias("payload"),
    )


def _timed_batches(spark, store, label):
    times = []
    for i in range(RUNS + 1):  # first is warm-up
        b = _batch(spark, 100 + i).localCheckpoint()
        before = store._bucket_paths(store.current_version())
        t0 = time.perf_counter()
        store.merge(b)
        dt = time.perf_counter() - t0
        after_v = store.current_version()
        after = store._bucket_paths(after_v)
        touched = [b_ for b_, rel in after.items() if before.get(b_) != rel]
        sizes = store.bucket_bytes(after_v)
        rewritten = sum(sizes[b_] for b_ in touched)
        if i:
            times.append((dt, len(touched), rewritten))
    times.sort()
    dt, nt, rw = times[len(times) // 2]
    print(
        f"{label}: median {dt:.2f}s, touched {nt} buckets, "
        f"rewrote {rw / (1 << 20):.1f} MiB "
        f"(runs {[f'{t:.2f}' for t, _, _ in times]})"
    )
    return dt


def main() -> None:
    copies = 1
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    spark = get_spark()
    df = _build(spark, copies).localCheckpoint()
    print(f"copies={copies} rows={df.count()}")

    root = f"/tmp/spark_graft_maintain_scale{copies}"
    if os.path.exists(root):
        shutil.rmtree(root)

    fixed = ParquetMergeStore(
        os.path.join(root, "fixed"),
        keys=("k",),
        version_cols=("v",),
        num_buckets=8,
    )
    fixed.merge(df)
    _timed_batches(spark, fixed, "fixed 8 buckets: per-batch merge")

    prov = ParquetMergeStore(
        os.path.join(root, "prov"),
        keys=("k",),
        version_cols=("v",),
        num_buckets=8,
    )
    prov.merge(df)
    t0 = time.perf_counter()
    act = prov.maintain(spark, target_bucket_bytes=TARGET)
    t_maintain = time.perf_counter() - t0
    print(
        f"maintain(target={TARGET >> 10}KiB): {act['action']} "
        f"-> {prov.num_buckets} buckets in {t_maintain:.2f}s "
        f"(amortized: once per geometric growth step, not per batch)"
    )
    _timed_batches(
        spark, prov, f"policy {prov.num_buckets} buckets: per-batch merge"
    )

    a = sorted(tuple(r) for r in fixed.read(spark).select("k", "v").collect())
    b = sorted(tuple(r) for r in prov.read(spark).select("k", "v").collect())
    assert a == b, "fixed and provisioned snapshots diverged"
    print("snapshot equivalence fixed==policy: ok")


if __name__ == "__main__":
    main()
