"""MOR vs COW per-batch maintenance cost at N× base size.

BASELINE's round-10 streaming-applier tiers showed the one honest
growth term in the maintenance path: the copy-on-write merge rewrites
every touched bucket, so a term-keyed batch (which touches ALL
buckets) pays a cost that grows with bucket size — 1.72× across a
100× index at fixed bucket count. ``MergeOnReadStore.commit_delta``
is the designed fix: O(batch) appends, resolution at read time,
amortized rewrite at compaction.

This script measures the claim head-to-head. At each tier it builds
the SAME postings base twice — once as a plain ParquetMergeStore
(COW) and once under a MergeOnReadStore — then times, for a FIXED
100-doc edit batch:

- COW ``store.merge(batch_postings)`` — bucket rewrites;
- MOR ``commit_delta`` of the same postings — log append only;
- the MOR resolved ``read`` (full-snapshot count) vs the pure base
  read, to show the overlay's bounded read overhead;
- one ``compact`` (the amortized rewrite, for the record).

Usage: python scripts/mor_scale_check.py [--copies N]   (default 10)
Run at 1 / 10 / 100 and record in BASELINE.md ('MOR vs COW').
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import scale_check as sc  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from parquet_demo_spark.catalog import load  # noqa: E402
from parquet_demo_spark.operators.search import inverted_index  # noqa: E402
from parquet_demo_spark.session import get_spark  # noqa: E402
from parquet_demo_spark.sources.merge_store import (  # noqa: E402
    ParquetMergeStore,
)
from parquet_demo_spark.sources.mor_store import (  # noqa: E402
    MergeOnReadStore,
)


def _once(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _timed(label: str, fn, runs: int = 3) -> float:
    fn()  # warm
    times = sorted(_once(fn) for _ in range(runs))
    med = times[len(times) // 2]
    print(f"{label}: median {med:.2f}s (runs {[f'{t:.2f}' for t in times]})")
    return med


def main() -> None:
    if "--copies" in sys.argv:
        i = sys.argv.index("--copies")
        sc.COPIES = int(sys.argv[i + 1])
    sc.DST = f"/tmp/spark_graft_scale{sc.COPIES}"
    spark = get_spark()
    sc.build("documents")
    print(f"copies={sc.COPIES}")

    root = f"/tmp/spark_graft_mor_scale{sc.COPIES}"
    if os.path.exists(root):
        shutil.rmtree(root)

    docs = load(spark, sc.DST, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    n = corpus.count()
    print(f"corpus docs={n}")
    postings = (
        inverted_index(corpus)
        .drop("bucket")
        .withColumn("edit_ts", F.lit(1).cast("bigint"))
    )

    kw = dict(
        keys=("term", "doc_id"), version_cols=("edit_ts",), num_buckets=16
    )
    cow = ParquetMergeStore(os.path.join(root, "cow"), **kw)
    t0 = time.perf_counter()
    cow.merge(postings)
    print(f"COW base build (linear): {time.perf_counter() - t0:.2f}s")
    mor = MergeOnReadStore(os.path.join(root, "mor"), **kw)
    mor.merge(postings)  # empty log -> COW bootstrap into mor's base

    # fixed-size edit batch: re-tokenized truncated edits of 100
    # copy-0 docs, tokenized ONCE and checkpointed — the timed loops
    # only re-stamp edit_ts on the pinned postings, so the recorded
    # cost is the COMMIT alone, not per-run tokenization
    base_span = (
        load(spark, sc.SRC, "documents")
        .agg(F.max("doc_id"))
        .collect()[0][0]
        + 1
    )
    edits = corpus.filter(
        (F.col("doc_id") < base_span) & (F.col("doc_id") % 50 == 1)
    ).select("doc_id", F.substring("text", 1, 120).alias("text"))
    ts = [10]

    fresh0 = (
        inverted_index(edits).drop("bucket").localCheckpoint()
    )
    print(f"edit batch postings={fresh0.count()}")

    def _batch():
        return fresh0.withColumn(
            "edit_ts", F.lit(ts[0]).cast("bigint")
        )

    def _cow_merge():
        ts[0] += 1
        cow.merge(_batch())

    _timed("COW merge (fixed batch, bucket rewrites)", _cow_merge)

    def _mor_delta():
        ts[0] += 1
        mor.commit_delta(_batch())

    _timed("MOR commit_delta (fixed batch, log append)", _mor_delta)
    print(f"MOR live deltas after timing: {mor.delta_count()}")

    _timed(
        "COW full read (count)", lambda: cow.read(spark).count()
    )
    _timed(
        "MOR overlay read (count)", lambda: mor.read(spark).count()
    )
    t0 = time.perf_counter()
    mor.compact(spark)
    print(f"MOR compact (amortized rewrite): {time.perf_counter() - t0:.2f}s")

    # --- the REAL q182 applier through MOR (admission probe +
    # tokenize + tombstones + delta append + watermark commit) — the
    # row to set against the COW applier's 'text leg' in BASELINE's
    # streaming-applier tiers
    from parquet_demo_spark.operators.search import index_batch_applier

    mstore = MergeOnReadStore(os.path.join(root, "mor_applied"), **kw)
    applier = index_batch_applier(spark, mstore)
    t0 = time.perf_counter()
    applier(
        corpus.select(
            "doc_id", "text", F.lit(1).cast("bigint").alias("edit_ts")
        ),
        0,
    )
    print(
        f"MOR stream batch 0 (corpus via applier, linear): "
        f"{time.perf_counter() - t0:.2f}s"
    )
    edit_docs = edits.localCheckpoint()
    tsa = [10]

    def _apply_real():
        tsa[0] += 1
        applier(
            edit_docs.select(
                "doc_id",
                "text",
                F.lit(tsa[0]).cast("bigint").alias("edit_ts"),
            ),
            tsa[0],
        )

    _timed(
        "MOR full _apply_batch (admission + tokenize + tombstones + "
        "delta append + wm commit)",
        _apply_real,
    )
    print(f"MOR applier live deltas: {mstore.delta_count()}")


if __name__ == "__main__":
    main()
