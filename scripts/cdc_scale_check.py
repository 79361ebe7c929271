"""CDC refresh-path scaling check (BASELINE.md §'Change-feed payoff').

Builds an N×-replicated events store (key columns offset per copy, the
scale_check.py recipe), commits a SMALL delta batch with
``write_change_feed=True``, then times the three ways to bring the
q134-style materialized view current:

  recompute   — _mv_agg over the full snapshot (the no-CDC baseline)
  diff        — changes_between(v0, v1, preimages) + refresh
                (re-reads every REWRITTEN bucket: hash bucketing
                scatters even a small key set across many buckets)
  stored feed — change_feed(v1) + refresh (reads only the commit's
                own change rows)

All three must produce the identical view (asserted); the point of the
run is the wall-clock separation as the table grows while the delta
stays fixed.

Usage: python scripts/cdc_scale_check.py [--copies N] [--delta-keys K]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parquet_demo_spark.operators.incremental import (
    _mv_agg,
    refresh_incremental,
)
from parquet_demo_spark.session import get_spark
from parquet_demo_spark.sources.merge_store import (
    ParquetMergeStore,
    changes_between,
)

SRC = "/root/testdata/sf0.1/events.parquet"


def main() -> None:
    copies = 10
    delta_keys = 2000
    args = sys.argv[1:]
    if "--copies" in args:
        copies = int(args[args.index("--copies") + 1])
    if "--delta-keys" in args:
        delta_keys = int(args[args.index("--delta-keys") + 1])

    spark = get_spark(app_name="cdc_scale_check", shuffle_partitions=32)
    ev0 = spark.read.parquet(SRC)
    if dict(ev0.dtypes)["ts"] == "bigint":
        ev0 = ev0.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    n0 = ev0.count()
    max_eid = ev0.agg(F.max("event_id")).first()[0] + 1
    max_uid = ev0.agg(F.max("user_id")).first()[0] + 1

    # N× replica with disjoint key ranges per copy (offset keys so the
    # PK domain scales with the data, the scale_check.py recipe)
    rep = ev0.crossJoin(
        spark.range(copies).select(F.col("id").alias("__copy"))
    ).select(
        (F.col("event_id") + F.col("__copy") * max_eid).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("__copy") * max_uid).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    base_dir = f"/tmp/spark_graft_cdc_scale/events_{copies}x"
    if os.path.exists(base_dir):
        shutil.rmtree(base_dir)
    rep.repartition(32).write.parquet(base_dir)
    ev = spark.read.parquet(base_dir)
    n = ev.count()
    print(f"events replica: {n:,} rows ({copies}x of {n0:,})")

    root = f"/tmp/spark_graft_cdc_scale/store_{copies}x"
    if os.path.exists(root):
        shutil.rmtree(root)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=64,
    )
    t0 = time.time()
    store.merge(ev)
    print(f"v0 merge ({n:,} rows, 64 buckets): {time.time() - t0:.2f}s")

    mv0_df = _mv_agg(store.read(spark, version=0))
    mv0 = mv0_df.localCheckpoint()  # the standing view, already current

    # small delta: bump `value` for events of `delta_keys` users — a
    # fixed-size change against a growing table
    uid_domain = copies * max_uid
    modk = max(2, uid_domain // delta_keys)
    delta = (
        ev.filter(F.col("user_id") % modk == 0)
        .withColumn("value", F.col("value") + F.lit(1.0))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    )
    nd = delta.count()
    t0 = time.time()
    store.merge(delta, write_change_feed=True)
    t_merge = time.time() - t0
    print(f"v1 merge (delta {nd:,} rows, feed written): {t_merge:.2f}s")

    def timed(tag, fn):
        t0 = time.time()
        out = sorted(tuple(r) for r in fn().collect())
        dt = time.time() - t0
        print(f"{tag:12s} {dt:8.2f}s  ({len(out)} groups)")
        return out, dt

    full, t_full = timed(
        "recompute", lambda: _mv_agg(store.read(spark, version=1))
    )
    diff, t_diff = timed(
        "diff",
        lambda: refresh_incremental(
            mv0, changes_between(store, spark, 0, 1, include_preimages=True)
        ),
    )
    feed, t_feed = timed(
        "stored feed",
        lambda: refresh_incremental(mv0, store.change_feed(spark, 1)),
    )
    assert full == diff == feed, "refresh paths disagree"
    print(
        f"speedup vs recompute: diff {t_full / t_diff:.1f}x, "
        f"feed {t_full / t_feed:.1f}x"
    )

    # --- MOR tier (round 13): the log-entry diff must stay O(Δ) as
    # the base grows — candidate keys are the appended dirs' rows,
    # pre-state is one bucket-pruned probe, never a base scan ---
    from parquet_demo_spark.sources.mor_store import MergeOnReadStore

    mroot = f"/tmp/spark_graft_cdc_scale/mor_{copies}x"
    if os.path.exists(mroot):
        shutil.rmtree(mroot)
    mst = MergeOnReadStore(
        mroot,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=64,
    )
    mst.commit_delta(ev)  # e0: bulk load through the log
    t0 = time.time()
    mst.compact(spark)  # e1: fold to base (stamps base_version)
    print(f"MOR bulk fold (compact): {time.time() - t0:.2f}s")
    e1 = mst.current_version()
    mmv0 = _mv_agg(mst.read(spark, version=e1)).localCheckpoint()
    t0 = time.time()
    mst.commit_delta(delta)  # e2: the same fixed-size correction
    t_append = time.time() - t0
    e2 = mst.current_version()
    print(f"MOR delta append ({nd:,} rows): {t_append:.2f}s")
    mfull, t_mfull = timed(
        "MOR recompute", lambda: _mv_agg(mst.read(spark, version=e2))
    )
    mdiff, t_mdiff = timed(
        "MOR log diff",
        lambda: refresh_incremental(
            mmv0,
            mst.changes_between(spark, e1, e2, include_preimages=True),
        ),
    )
    assert mfull == mdiff == full, "MOR refresh paths disagree"
    print(
        f"MOR speedup vs recompute: log diff {t_mfull / t_mdiff:.1f}x"
    )

    # --- MOR stored-feed tier (round 14): the writer pays ONE
    # bucket-pruned probe at commit time (write_change_feed=True) and
    # every consumer then reads O(Δ) feed rows — flat in base size,
    # the COW stored-feed trade mirrored onto the delta log ---
    delta2 = delta.withColumn(
        "value", F.col("value") + F.lit(1.0)
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    mmv1 = _mv_agg(mst.read(spark, version=e2)).localCheckpoint()
    t0 = time.time()
    mst.commit_delta(delta2, write_change_feed=True)
    t_append_feed = time.time() - t0
    e3 = mst.current_version()
    print(
        f"MOR delta append + feed write ({nd:,} rows, one probe): "
        f"{t_append_feed:.2f}s (plain append was {t_append:.2f}s)"
    )
    mfull3, t_mfull3 = timed(
        "MOR recompute@e3", lambda: _mv_agg(mst.read(spark, version=e3))
    )
    mfeed, t_mfeed = timed(
        "MOR stored feed",
        lambda: refresh_incremental(mmv1, mst.change_feed(spark, e3)),
    )
    assert mfull3 == mfeed, "MOR stored-feed refresh disagrees"
    print(
        f"MOR speedup vs recompute: stored feed {t_mfull3 / t_mfeed:.1f}x"
    )


if __name__ == "__main__":
    main()
