"""Streaming ANN index maintenance (q160) — store-state laws.

The oracle test proves the FINAL SEARCH equals a fresh rebuild; these
assert the intermediate store semantics directly: doc-level LWW rejects
stale rewrites, deletes tombstone junk out, and every surviving vector
carries the encoding the frozen codebooks would assign it in batch.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_maintained_store_state(spark, sf_smoke):
    from parquet_demo_spark.operators.similarity import (
        _planted_sets,
        _q160_build,
        _q160_read,
    )

    root, src, schema, q156_state = _q160_build(spark, sf_smoke)
    df = _q160_read(spark, sf_smoke, (root, src, schema, q156_state))
    row = df.collect()[0]
    assert row["method"] == "ivfpq_stream_maintained"

    # the read above ran the stream into vecidx<N>; reopen the newest
    import glob
    import os

    from parquet_demo_spark.sources.merge_store import ParquetMergeStore

    idx_dirs = sorted(glob.glob(os.path.join(root, "vecidx*")))
    store = ParquetMergeStore(
        idx_dirs[-1], keys=("vec_id",), version_cols=("edit_ts",), num_buckets=8
    )
    snap = store.read(spark)

    base, probes0, planted = _planted_sets(spark, sf_smoke)
    n_base = base.count()
    n_planted = planted.count()

    # final state = base ∪ planted exactly: junk deleted, nothing extra
    assert snap.count() == n_base + n_planted
    assert snap.filter(F.col("vec_id") >= 2000000).count() == 0

    # LWW: every planted vector carries the CORRECT (edit_ts=3) version,
    # not the negated batch-0/batch-2 wrong versions
    joined = snap.join(
        planted.select("vec_id", F.col("e").alias("want")), "vec_id"
    )
    assert joined.count() == n_planted
    assert joined.filter(F.col("edit_ts") != 3).count() == 0
    mismatch = joined.filter(
        F.exists(
            F.zip_with(
                F.col("e"), F.col("want"), lambda a, b: a != b
            ),
            lambda x: x,
        )
    )
    assert mismatch.count() == 0

    # every row is fully encoded: a live row never has a NULL cell or
    # missing codes (tombstones can't survive the merge)
    assert snap.filter(F.col("cid").isNull()).count() == 0
    assert snap.filter(F.size("codes") != 4).count() == 0
