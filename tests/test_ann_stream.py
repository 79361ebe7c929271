"""Streaming ANN index maintenance (q160) — store-state laws.

The oracle test proves the FINAL SEARCH equals a fresh rebuild; these
assert the intermediate store semantics directly: doc-level LWW rejects
stale rewrites, deletes tombstone junk out, and every surviving vector
carries the encoding the frozen codebooks would assign it in batch.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.mark.slow
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

    idx_dirs = sorted(
        d
        for d in glob.glob(os.path.join(root, "vecidx*"))
        if not d.endswith("_wm")  # skip the admission-watermark sibling
    )
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


@pytest.mark.slow
def test_stale_upsert_after_delete_is_rejected(spark, tmp_path):
    """ADVICE r8 (medium): a deleted vector's LWW watermark must survive
    the deletion. Previously the watermark came from the vector's
    surviving index row, so a delete erased it and a LATE stale upsert
    (older edit_ts arriving after the delete) resurrected the vector
    with stale data. The vec_id-keyed side store keeps the timestamp."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from parquet_demo_spark.operators.similarity import (
        stream_maintain_ann_index,
    )
    from parquet_demo_spark.sources.merge_store import ParquetMergeStore

    dim = 64
    icent1 = spark.createDataFrame(
        [(0, [0.0] * dim)], "cid int, c array<double>"
    )
    pcent1 = spark.createDataFrame(
        [(m, 0, [0.0] * 16) for m in range(4)],
        "m int, cid int, c array<double>",
    )
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("e", T.ArrayType(T.DoubleType())),
            T.StructField("edit_ts", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
    )
    batches = [
        [
            (1, [1.0] * dim, 1, "upsert"),
            (2, [2.0] * dim, 1, "upsert"),
        ],
        [(2, None, 5, "delete")],
        [(2, [9.0] * dim, 3, "upsert")],  # STALE (3 < 5): must NOT apply
    ]
    src = os.path.join(str(tmp_path), "incoming")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        d = os.path.join(str(tmp_path), f"scratch{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        [part] = glob.glob(os.path.join(d, "part-*.parquet"))
        shutil.move(part, os.path.join(src, f"batch{i}.parquet"))
        shutil.rmtree(d)
    store = ParquetMergeStore(
        os.path.join(str(tmp_path), "vstore"),
        keys=("vec_id",),
        version_cols=("edit_ts",),
        num_buckets=4,
    )
    q = stream_maintain_ann_index(
        spark,
        src,
        schema,
        store,
        os.path.join(str(tmp_path), "ckpt"),
        icent1,
        pcent1,
    )
    q.awaitTermination()
    snap = store.read(spark)
    assert [r.vec_id for r in snap.collect()] == [1]
    # the watermark survived the delete at ts=5
    from parquet_demo_spark.sources.merge_store import (
        admission_watermarks,
    )

    wm = admission_watermarks(store, keys=("vec_id",))
    got = {r.vec_id: r.edit_ts for r in wm.read(spark).collect()}
    assert got == {1: 1, 2: 5}
