"""Deletion-vector payoff: targeted DELETE wall vs rewrite mode.

Builds an events-shaped store (N rows, 16 buckets), then deletes the
SAME tiny key slice (~0.01%) two ways — the classic bucket rewrite and
deletion_vectors=True — and times each, plus the read-back after. The
rewrite pays every touched bucket's full rewrite; the DV commit writes
only the matching PKs. Record in BASELINE.md §'Deletion vectors'.

Usage: python scripts/dv_scale_check.py [--rows N]
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
from parquet_demo_spark.sources.merge_store import ParquetMergeStore

ROWS = 2_000_000


def main() -> None:
    rows = ROWS
    args = sys.argv[1:]
    if "--rows" in args:
        rows = int(args[args.index("--rows") + 1])
    spark = get_spark(app_name="dv_scale_check", shuffle_partitions=16)
    base = os.path.join(
        tempfile.gettempdir(), f"spark_graft_dv_{os.getpid()}"
    )
    batch = (
        spark.range(rows)
        .select(
            F.col("id").alias("k"),
            F.lit(1).cast("long").alias("v"),
            (F.col("id") % 1000).alias("grp"),
            (F.rand(42) * 100).alias("value"),
        )
        .localCheckpoint()
    )
    # every 10_000th key: ~0.01% of rows, scattered over every bucket
    # (the worst case for rewrite mode — all buckets touch)
    pred = "k % 10000 = 0"
    out = {}
    for mode, dv in (("rewrite", False), ("dv", True)):
        root = os.path.join(base, mode)
        shutil.rmtree(root, ignore_errors=True)
        st = ParquetMergeStore(
            root, keys=("k",), version_cols=("v",), num_buckets=16
        )
        st.merge(batch)
        t0 = time.time()
        st.delete(spark, pred, deletion_vectors=dv)
        t_del = time.time() - t0
        t0 = time.time()
        n = st.read(spark).count()
        t_read = time.time() - t0
        out[mode] = (t_del, t_read, n)
        print(
            f"{mode:8s} delete={t_del:6.2f}s  read-back={t_read:5.2f}s "
            f"rows={n}",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    assert out["rewrite"][2] == out["dv"][2]
    print(
        f"dv delete is {out['rewrite'][0] / out['dv'][0]:.1f}x faster; "
        f"read-back tax {out['dv'][1] / out['rewrite'][1]:.2f}x",
        flush=True,
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
