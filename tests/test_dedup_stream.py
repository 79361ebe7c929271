"""Streaming MinHash-LSH dedup-index maintenance (q166) — store laws.

The oracle row proves the final (docs, band rows, candidate pairs)
triple equals a fresh run of the frozen hash family over each doc's
winning edit; these pin the intermediate store semantics directly:
doc-level LWW rejects stale rewrites, edited-to-empty docs tombstone
out entirely, surviving docs carry the signatures a batch build would
assign, and batch replay is idempotent.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_demo_spark.operators.dedup import (
    band_candidate_pairs,
    minhash_band_signatures,
    stream_maintain_dedup_index,
)
from parquet_demo_spark.sources.merge_store import ParquetMergeStore

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("edit_ts", T.LongType()),
    ]
)

_T0 = "the quick brown fox jumps over the lazy dog again and again"
_T1 = "a completely different set of words makes a different signature"
_T2 = "the quick brown fox jumps over the lazy dog again and again"


def _write_batches(spark, tmp_path, batches):
    src = os.path.join(str(tmp_path), "incoming")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        d = os.path.join(str(tmp_path), f"scratch{i}")
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        [part] = glob.glob(os.path.join(d, "part-*.parquet"))
        shutil.move(part, os.path.join(src, f"batch{i}.parquet"))
        shutil.rmtree(d)
    return src


def _run_stream(spark, tmp_path, src, tag):
    store = ParquetMergeStore(
        os.path.join(str(tmp_path), f"lsh_{tag}"),
        keys=("band", "doc_id"),
        version_cols=("edit_ts",),
        num_buckets=4,
    )
    q = stream_maintain_dedup_index(
        spark,
        src,
        _SCHEMA,
        store,
        os.path.join(str(tmp_path), f"ckpt_{tag}"),
    )
    q.awaitTermination()
    return store


def test_stream_equals_batch_rebuild_on_winning_edits(spark, tmp_path):
    """Final band rows ≡ minhash_band_signatures over the LWW corpus."""
    src = _write_batches(
        spark,
        tmp_path,
        [
            [(1, _T0, 1), (2, _T1, 1), (3, _T2, 1)],
            [(2, _T0, 3)],  # doc 2 rewritten to doc 1's text
            [(2, _T1, 2)],  # LATE stale rewrite: must NOT apply
        ],
    )
    store = _run_stream(spark, tmp_path, src, "eq")
    got = sorted(
        tuple(r)
        for r in store.read(spark).select("band", "doc_id", "sig").collect()
    )
    winning = spark.createDataFrame(
        [(1, _T0), (2, _T0), (3, _T2)], "doc_id long, text string"
    )
    want = sorted(
        tuple(r)
        for r in minhash_band_signatures(winning)
        .select("band", "doc_id", "sig")
        .collect()
    )
    assert got == want
    # docs 1/2/3 now share text ⇒ all three pairs collide in both bands
    pairs = sorted(
        tuple(r)
        for r in band_candidate_pairs(
            store.read(spark).select("doc_id", "band", "sig")
        ).collect()
    )
    assert pairs == [(1, 2), (1, 3), (2, 3)]


def test_emptied_doc_tombstones_out(spark, tmp_path):
    src = _write_batches(
        spark,
        tmp_path,
        [
            [(1, _T0, 1), (2, _T1, 1)],
            [(2, "", 2)],  # edited to empty: no shingles, rows must go
        ],
    )
    store = _run_stream(spark, tmp_path, src, "empty")
    snap = store.read(spark)
    assert snap.filter(F.col("doc_id") == 2).count() == 0
    assert snap.filter(F.col("doc_id") == 1).count() == 2  # both bands
    # a NEWER re-add after the delete re-indexes the doc (tombstoning
    # removes the doc's rows AND its LWW watermark — the q155/q160
    # trade: exactly-once holds under same-batch replay, which
    # re-deletes idempotently, not under resurrection of older batches
    # the checkpoint would never re-deliver)
    src2 = _write_batches(spark, tmp_path, [[(2, _T1, 3)]])
    q = stream_maintain_dedup_index(
        spark,
        src2,
        _SCHEMA,
        store,
        os.path.join(str(tmp_path), "ckpt_empty2"),
    )
    q.awaitTermination()
    assert store.read(spark).filter(F.col("doc_id") == 2).count() == 2


def test_replay_is_idempotent(spark, tmp_path):
    """Re-delivering every batch converges to the same committed state."""
    batches = [
        [(1, _T0, 1), (2, _T1, 1)],
        [(2, _T0, 3), (3, _T1, 2)],
    ]
    src = _write_batches(spark, tmp_path, batches)
    store = _run_stream(spark, tmp_path, src, "replay")
    before = sorted(
        tuple(r)
        for r in store.read(spark).select("band", "doc_id", "sig").collect()
    )
    v_before = store.current_version()
    # replay the SAME files through a fresh checkpoint (at-least-once
    # redelivery): LWW must reject every row, burning no version
    q = stream_maintain_dedup_index(
        spark,
        src,
        _SCHEMA,
        store,
        os.path.join(str(tmp_path), "ckpt_replay2"),
    )
    q.awaitTermination()
    after = sorted(
        tuple(r)
        for r in store.read(spark).select("band", "doc_id", "sig").collect()
    )
    assert after == before
    assert store.current_version() == v_before


def test_short_doc_produces_no_band_rows(spark, tmp_path):
    """< 2 tokens ⇒ no shingles ⇒ indexed nowhere (and no crash — the
    descending-sequence guard in minhash_band_signatures)."""
    src = _write_batches(
        spark, tmp_path, [[(1, "word", 1), (2, "", 1), (3, _T0, 1)]]
    )
    store = _run_stream(spark, tmp_path, src, "short")
    snap = store.read(spark)
    assert sorted(
        r["doc_id"] for r in snap.select("doc_id").distinct().collect()
    ) == [3]


def test_incremental_candidates_equal_cross_subset_of_batch(spark):
    """incremental admission ≡ the incoming×corpus restriction of the
    full batch candidate set (same frozen family both ways)."""
    from parquet_demo_spark.catalog import load
    from parquet_demo_spark.operators.dedup import (
        incremental_dedup_candidates,
        minhash_candidate_pairs,
    )

    docs = (
        load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 300)
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    got = sorted(
        tuple(r)
        for r in incremental_dedup_candidates(
            incoming, minhash_band_signatures(corpus)
        ).collect()
    )
    full = minhash_candidate_pairs(docs)
    want = sorted(
        (a, b) if a % 5 == 0 else (b, a)
        for a, b in (
            (r["doc_a"], r["doc_b"]) for r in full.collect()
        )
        if (a % 5 == 0) != (b % 5 == 0)
    )
    assert got == sorted(set(want))
