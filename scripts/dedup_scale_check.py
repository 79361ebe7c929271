"""N× scale check for the dedup-index family (q166/q167).

Replicates the sf0.1 documents table ×N (scale_check's builder), then
measures the three costs whose scaling the design claims:

- **corpus index build** (one-time): minhash_band_signatures over the
  whole corpus → one store merge. Linear in corpus — the cost a
  deployment pays once, and what q167's admission path AVOIDS paying
  per batch.
- **admission check** (per batch, q167): a FIXED-SIZE incoming batch
  (copy-0's doc_id%5==0 slice) encoded fresh and equi-joined against
  the STORED band table. Claim: grows with the band-table scan (2
  rows/doc — far lighter than re-encoding text), never with all-pairs.
- **maintenance merge** (per batch, q166): a FIXED-SIZE edit batch
  upserted into the N× band store through the same merge path the
  stream commits. Claim: ~flat — cost is the batch's touched buckets,
  not the index.
- **full _apply_batch** (per batch, q166 — VERDICT r8 #4): the REAL
  foreachBatch applier (``dedup_index_batch_applier``), i.e.
  batch-LWW collapse + bucket-pruned watermark-probe admission +
  encode + tombstones + merge + watermark commit. Claim: ~flat vs
  index size — the admission probe reads the batch's buckets of the
  one-row-per-doc watermark table, never the band table.

Usage: python scripts/dedup_scale_check.py [--copies N]   (default 10)
Run at 1 and 10 (or 10 and 100) and record the ratio in BASELINE.md.
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
from parquet_demo_spark.operators.dedup import (  # noqa: E402
    incremental_dedup_candidates,
    minhash_band_signatures,
)
from parquet_demo_spark.session import get_spark  # noqa: E402
from parquet_demo_spark.sources.merge_store import ParquetMergeStore  # noqa: E402


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
    docs = load(spark, sc.DST, "documents").select("doc_id", "text")
    n_docs = docs.count()
    print(f"copies={sc.COPIES} corpus docs={n_docs}")

    root = f"/tmp/spark_graft_dedup_scale{sc.COPIES}"
    if os.path.exists(root):
        shutil.rmtree(root)
    store = ParquetMergeStore(
        os.path.join(root, "lsh"),
        keys=("band", "doc_id"),
        num_buckets=16,
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    t0 = time.perf_counter()
    store.merge(
        minhash_band_signatures(corpus).select("band", "doc_id", "sig")
    )
    print(f"index build (one-time, linear): {time.perf_counter() - t0:.2f}s")

    # fixed-size incoming batch: copy-0's holdout slice only
    base_span = load(spark, "/root/testdata/sf0.1", "documents").agg(
        F.max("doc_id")
    ).collect()[0][0] + 1
    incoming = docs.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < base_span)
    )
    print(f"incoming batch docs={incoming.count()}")

    def _admit():
        incremental_dedup_candidates(
            incoming, store.read(spark).select("doc_id", "band", "sig")
        ).agg(F.count("*")).collect()

    _timed("admission check (fixed batch, q167 read path)", _admit)

    # fixed-size maintenance batch: re-edit 1/50th of copy-0's corpus
    edits = corpus.filter(
        (F.col("doc_id") < base_span) & (F.col("doc_id") % 50 == 1)
    ).select("doc_id", F.substring("text", 1, 120).alias("text"))
    fresh = (
        minhash_band_signatures(edits)
        .select("band", "doc_id", "sig")
        .localCheckpoint()  # encode once, outside the timed merges
    )

    def _maintain():
        store.merge(fresh)

    _timed("maintenance merge (fixed batch, q166 commit path)", _maintain)

    # the REAL streaming applier, against a store built THROUGH it so
    # the watermark side table exists at corpus scale (VERDICT r8 #4:
    # bare store.merge bypasses admission; this times the whole path)
    from parquet_demo_spark.operators.dedup import (
        dedup_index_batch_applier,
    )

    sroot = os.path.join(root, "lsh_stream")
    sstore = ParquetMergeStore(
        sroot,
        keys=("band", "doc_id"),
        version_cols=("edit_ts",),
        num_buckets=16,
    )
    applier = dedup_index_batch_applier(spark, sstore)
    t0 = time.perf_counter()
    applier(
        corpus.select(
            "doc_id", "text", F.lit(1).cast("bigint").alias("edit_ts")
        ),
        0,
    )
    print(
        f"stream batch 0 (corpus index via applier, linear): "
        f"{time.perf_counter() - t0:.2f}s"
    )
    edit_batch = (
        corpus.filter(
            (F.col("doc_id") < base_span) & (F.col("doc_id") % 50 == 1)
        )
        .select(
            "doc_id",
            F.substring("text", 1, 120).alias("text"),
        )
        .localCheckpoint()
    )
    ts = [10]

    def _apply_real():
        ts[0] += 1  # strictly newer each run so admission passes
        applier(
            edit_batch.select(
                "doc_id",
                "text",
                F.lit(ts[0]).cast("bigint").alias("edit_ts"),
            ),
            ts[0],
        )

    _timed(
        "full _apply_batch (fixed batch: admission probe + encode + "
        "merge + wm commit)",
        _apply_real,
    )


if __name__ == "__main__":
    main()
