"""N× scale check for the executor-side bloom build (VERDICT r10 #1).

The round-10 design built per-bucket bloom filters ON THE DRIVER:
every commit of a store with opt-in ``bloom_cols`` re-read each
just-written bucket via pyarrow and folded its values into a bitmap in
a Python loop — per-commit driver work and memory ∝ rows written,
which serializes a 100 TB ingest path through one process. Round 11
moves construction into a Spark job (``_out_dir_blooms``: mapInArrow
partial bitmaps per input partition, driver ORs the partials), leaving
the driver only O(partitions × columns × 16 KiB).

This script measures all three terms at a fixed bucket count (so
bucket SIZE grows with --copies — the adversarial case the round-10
tiers identified):

- ``old driver build``: the former pyarrow read + to_pylist() loop,
  replicated inline — the baseline whose growth justified the rework.
- ``new bloom job``: the distributed build, wall-clock (executor work
  still ∝ rows, as any build must be, but spread over the cluster).
- ``driver fold``: the ONLY driver-side step of the new path, timed
  over the job's collected partials — the flatness claim.

It also asserts the new bitmaps are BIT-IDENTICAL to the old builder's
(same pruning behavior, composable with partition rollups).

Usage: python scripts/bloom_scale_check.py [--copies N]   (default 1)
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
    _BLOOM_K,
    _BLOOM_MAX_BITS,
    ParquetMergeStore,
    _bloom_build,
)

ROWS_BASE = 20_000


def main() -> None:
    copies = 1
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    # this script times the DISTRIBUTED build (its whole point); the
    # round-13 small-commit driver fast path would otherwise intercept
    # the sub-64 MiB tiers. The adaptive path's bit-identity is
    # asserted separately below (and in tests/test_merge_store.py).
    os.environ["SPARK_GRAFT_BLOOM_DRIVER_MAX_BYTES"] = "0"
    spark = get_spark()
    rows = ROWS_BASE * copies
    df = spark.range(rows).select(
        F.col("id").alias("k"),
        F.lit(1).cast("bigint").alias("v"),
        F.concat(F.lit("t"), (F.col("id") % 5000).cast("string")).alias(
            "tag"
        ),
        (F.col("id") * 31).alias("num"),
    )
    root = f"/tmp/spark_graft_bloom_scale{copies}"
    if os.path.exists(root):
        shutil.rmtree(root)
    store = ParquetMergeStore(
        root,
        keys=("k",),
        version_cols=("v",),
        num_buckets=8,  # FIXED: bucket size grows linearly with copies
        bloom_cols=("tag", "num"),
    )
    t0 = time.perf_counter()
    store.merge(df)
    t_commit = time.perf_counter() - t0
    m = store._read_manifest(0)
    rels = sorted(set(m["bucket_paths"].values()))
    out_dir = os.path.join(store.root, os.path.dirname(rels[0]))

    # old round-10 path, replicated: per-bucket pyarrow read +
    # to_pylist + driver-side bitmap fold
    import pyarrow.parquet as pq

    t0 = time.perf_counter()
    old = {}
    for rel in rels:
        b = int(rel.rsplit("=", 1)[1])
        tbl = pq.read_table(
            os.path.join(store.root, rel), columns=["tag", "num"]
        )
        old[b] = {
            c: _bloom_build(tbl.column(c).to_pylist())
            for c in ("tag", "num")
        }
    t_old = time.perf_counter() - t0

    # new path, split: distributed job+collect vs driver-only repack.
    # Since the round-11 executor-side bit_or reduction, the driver
    # sees ≤ buckets × columns word arrays — never per-partition
    # partials — so the fold input is capped by layout, not by data.
    t0 = time.perf_counter()
    new = store._out_dir_blooms(spark, out_dir)
    t_new_total = time.perf_counter() - t0

    final_rows = None
    orig_fold = ParquetMergeStore._fold_bloom_rows

    def capture(rows, m_, k_):
        nonlocal final_rows
        final_rows = rows
        return orig_fold(rows, m_, k_)

    ParquetMergeStore._fold_bloom_rows = staticmethod(capture)
    try:
        store._out_dir_blooms(spark, out_dir)
    finally:
        ParquetMergeStore._fold_bloom_rows = staticmethod(orig_fold)
    t0 = time.perf_counter()
    folded = orig_fold(final_rows, _BLOOM_MAX_BITS, _BLOOM_K)
    t_fold = time.perf_counter() - t0

    assert folded == new
    for b, cm in new.items():
        for c, bloom in cm.items():
            assert bloom == old[b][c], f"bucket {b} col {c} bits differ"

    # round-12: the partitioned-merge BATCHED build (one job over many
    # children's output dirs, keyed by tag) must be bit-identical to
    # the per-dir build AND per-tag isolated. Two GENUINELY DISJOINT
    # halves (even/odd bucket dirs symlinked under two synthetic out
    # dirs) catch cross-tag contamination — tagging the same dir
    # twice could not (OR of identical bitmaps is identical; a
    # regression ORing across tags would still 'pass').
    halves = {"even": {}, "odd": {}}
    for tag in halves:
        hd = os.path.join(os.path.dirname(out_dir), f"_half_{tag}")
        if os.path.exists(hd):
            shutil.rmtree(hd)
        os.makedirs(hd)
        halves[tag] = hd
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("__bucket="):
            continue
        b = int(d.split("=", 1)[1])
        os.symlink(
            os.path.join(out_dir, d),
            os.path.join(halves["even" if b % 2 == 0 else "odd"], d),
        )
    t0 = time.perf_counter()
    batched = ParquetMergeStore._out_dirs_blooms(
        spark,
        {"whole": out_dir, **halves},
        ("tag", "num"),
    )
    t_batched = time.perf_counter() - t0
    assert batched["whole"] == new, "batched['whole'] != per-dir build"
    for tag, want_mod in (("even", 0), ("odd", 1)):
        want = {b: cm for b, cm in new.items() if b % 2 == want_mod}
        assert batched[tag] == want, (
            f"batched[{tag!r}] != the per-dir build's {tag} buckets "
            "(cross-tag contamination or a dropped tag key)"
        )

    print(
        f"copies={copies} rows={rows} buckets={len(rels)} "
        f"driver_rows={len(final_rows)} (= buckets x bloom cols)"
    )
    print(f"commit total (merge incl. bloom job): {t_commit:.2f}s")
    print(f"old driver build (r10 path, all-driver): {t_old:.2f}s")
    print(f"new bloom job (distributed, wall): {t_new_total:.2f}s")
    print(f"new DRIVER fold only ({len(final_rows)} rows): {t_fold:.3f}s")
    print(
        f"batched 3-tag build (one job: whole + disjoint halves): "
        f"{t_batched:.2f}s"
    )

    # round-13 adaptive fast path: the driver-side small-commit build
    # must be bit-identical to the distributed one over the same dirs
    t0 = time.perf_counter()
    fast = ParquetMergeStore._dirs_blooms_driver(
        {"whole": out_dir, **halves}, ("tag", "num")
    )
    t_fast = time.perf_counter() - t0
    assert fast == batched, "driver fast path != distributed build"
    print(f"driver fast path (round-13, 3 tags): {t_fast:.2f}s")
    print(
        "bit-identity old==new==batched==fastpath "
        "(+ per-tag isolation): ok"
    )


if __name__ == "__main__":
    main()
