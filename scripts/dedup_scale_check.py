"""N× scale check for the streaming-maintenance family: the REAL
foreachBatch appliers of all three legs — dedup (q166/q167), text
(q155), ANN (q160) — timed against an N× index (VERDICT r9 #4).

Replicates the sf0.1 documents/embeddings tables ×N (scale_check's
builder), builds each leg's index THROUGH its real applier (so the
watermark side stores exist at corpus scale), then times a FIXED-SIZE
batch through the same applier. The claim under measurement: the
per-batch cost — batch-LWW collapse + bucket-pruned watermark-probe
admission + encode + tombstones + one atomic merge + watermark commit —
is ~flat in index size, because admission probes the batch's buckets
of a one-row-per-entity side table, never the index.

Also measured for the dedup leg (the original rows): one-time linear
index build, the q167 admission read path, and a bare maintenance
merge.

Usage: python scripts/dedup_scale_check.py [--copies N] [--legs dedup,text,ann]
                                           [--store cow|mor]
Default copies=10, all legs, cow. ``--store mor`` runs each leg's REAL
applier against a MergeOnReadStore instead (same admission, encode and
tombstone path; the commit swaps to an O(batch) delta append) — the
round-11 rows beside the COW rows in BASELINE's 'MOR vs COW'. Run at
1 / 10 / 100 and record the ratios in BASELINE.md.
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

import scale_check as sc  # noqa: E402  (sibling script, reused builder)

from pyspark.sql import functions as F  # noqa: E402

from parquet_demo_spark.catalog import load  # noqa: E402
from parquet_demo_spark.operators.dedup import (  # noqa: E402
    dedup_index_batch_applier,
    incremental_dedup_candidates,
    minhash_band_signatures,
)
from parquet_demo_spark.session import get_spark  # noqa: E402
from parquet_demo_spark.sources.merge_store import (  # noqa: E402
    ParquetMergeStore,
)
from parquet_demo_spark.sources.mor_store import (  # noqa: E402
    MergeOnReadStore,
)

STORE = "cow"


def _applier_store(root: str, name: str, **kw):
    """The store each leg's REAL applier maintains: COW by default,
    MergeOnReadStore under --store mor (appliers are store-polymorphic;
    COW≡MOR output equivalence is pytest-pinned per leg)."""
    if STORE == "mor":
        return MergeOnReadStore(os.path.join(root, name + "_mor"), **kw)
    return ParquetMergeStore(os.path.join(root, name), **kw)


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


def _base_doc_span(spark) -> int:
    return (
        load(spark, "/root/testdata/sf0.1", "documents")
        .agg(F.max("doc_id"))
        .collect()[0][0]
        + 1
    )


def leg_dedup(spark, root: str) -> None:
    docs = load(spark, sc.DST, "documents").select("doc_id", "text")
    n_docs = docs.count()
    print(f"[dedup] corpus docs={n_docs}")
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
    print(
        f"[dedup] index build (one-time, linear): "
        f"{time.perf_counter() - t0:.2f}s"
    )

    # fixed-size incoming batch: copy-0's holdout slice only
    base_span = _base_doc_span(spark)
    incoming = docs.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < base_span)
    )
    print(f"[dedup] incoming batch docs={incoming.count()}")

    def _admit():
        incremental_dedup_candidates(
            incoming, store.read(spark).select("doc_id", "band", "sig")
        ).agg(F.count("*")).collect()

    _timed("[dedup] admission check (fixed batch, q167 read path)", _admit)

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

    _timed(
        "[dedup] maintenance merge (fixed batch, q166 commit path)",
        _maintain,
    )

    # the REAL streaming applier, against a store built THROUGH it so
    # the watermark side table exists at corpus scale (VERDICT r8 #4:
    # bare store.merge bypasses admission; this times the whole path)
    sstore = _applier_store(
        root,
        "lsh_stream",
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
        f"[dedup] stream batch 0 (corpus via applier, linear): "
        f"{time.perf_counter() - t0:.2f}s"
    )
    edit_batch = edits.localCheckpoint()
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
        "[dedup] full _apply_batch (admission probe + encode + merge "
        "+ wm commit)",
        _apply_real,
    )


def leg_text(spark, root: str) -> None:
    from parquet_demo_spark.operators.search import index_batch_applier

    docs = load(spark, sc.DST, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    print(f"[text] corpus docs={corpus.count()}")
    store = _applier_store(
        root,
        "postings",
        keys=("term", "doc_id"),
        version_cols=("edit_ts",),
        num_buckets=16,
    )
    applier = index_batch_applier(spark, store)
    t0 = time.perf_counter()
    applier(
        corpus.select(
            "doc_id", "text", F.lit(1).cast("bigint").alias("edit_ts")
        ),
        0,
    )
    print(
        f"[text] stream batch 0 (corpus index via applier, linear): "
        f"{time.perf_counter() - t0:.2f}s"
    )
    base_span = _base_doc_span(spark)
    edit_batch = (
        corpus.filter(
            (F.col("doc_id") < base_span) & (F.col("doc_id") % 50 == 1)
        )
        .select("doc_id", F.substring("text", 1, 120).alias("text"))
        .localCheckpoint()
    )
    print(f"[text] edit batch docs={edit_batch.count()}")
    ts = [10]

    def _apply_real():
        ts[0] += 1
        applier(
            edit_batch.select(
                "doc_id",
                "text",
                F.lit(ts[0]).cast("bigint").alias("edit_ts"),
            ),
            ts[0],
        )

    _timed(
        "[text] full _apply_batch (admission probe + tokenize + "
        "tombstones + merge + wm commit)",
        _apply_real,
    )


def leg_ann(spark, root: str) -> None:
    from parquet_demo_spark.operators.similarity import (
        _km_assign,
        _km_update,
        _pq_encode,
        ann_index_batch_applier,
    )

    sc.build("embeddings")
    emb_n = load(spark, sc.DST, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    print(f"[ann] corpus vectors={emb_n.count()}")
    # frozen structures trained ONCE on the BASE corpus (the production
    # contract: codebooks version separately from data, batches never
    # retrain them) — training cost is not part of the per-batch claim
    base0 = (
        load(spark, "/root/testdata/sf0.1", "embeddings")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        .localCheckpoint()
    )
    icent0 = base0.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("c")
    )
    ia1 = _km_assign(
        base0.select("vec_id", F.col("e").alias("embedding")), icent0
    )
    icent1 = _km_update(ia1.select("cid", "embedding")).localCheckpoint()
    empty_probes = base0.limit(0).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    _, _, pcent1 = _pq_encode(base0, base0, empty_probes, pin=False)
    pcent1 = pcent1.localCheckpoint()

    store = _applier_store(
        root,
        "codes",
        keys=("vec_id",),
        version_cols=("edit_ts",),
        num_buckets=16,
    )
    applier = ann_index_batch_applier(spark, store, icent1, pcent1)
    t0 = time.perf_counter()
    applier(
        emb_n.select(
            "vec_id",
            "e",
            F.lit(1).cast("bigint").alias("edit_ts"),
            F.lit("upsert").alias("op"),
        ),
        0,
    )
    print(
        f"[ann] stream batch 0 (corpus encode via applier, linear): "
        f"{time.perf_counter() - t0:.2f}s"
    )
    base_vec_span = (
        load(spark, "/root/testdata/sf0.1", "embeddings")
        .agg(F.max("vec_id"))
        .collect()[0][0]
        + 1
    )
    edit_batch = (
        emb_n.filter(
            (F.col("vec_id") < base_vec_span) & (F.col("vec_id") % 50 == 1)
        )
        .select(
            "vec_id",
            F.transform(F.col("e"), lambda v: v * 1.01).alias("e"),
        )
        .localCheckpoint()
    )
    print(f"[ann] edit batch vectors={edit_batch.count()}")
    ts = [10]

    def _apply_real():
        ts[0] += 1
        applier(
            edit_batch.select(
                "vec_id",
                "e",
                F.lit(ts[0]).cast("bigint").alias("edit_ts"),
                F.lit("upsert").alias("op"),
            ),
            ts[0],
        )

    _timed(
        "[ann] full _apply_batch (admission probe + frozen-codebook "
        "encode + merge + wm commit)",
        _apply_real,
    )


def main() -> None:
    global STORE
    legs = ["dedup", "text", "ann"]
    if "--copies" in sys.argv:
        i = sys.argv.index("--copies")
        sc.COPIES = int(sys.argv[i + 1])
    if "--legs" in sys.argv:
        i = sys.argv.index("--legs")
        legs = [x.strip() for x in sys.argv[i + 1].split(",") if x.strip()]
    if "--store" in sys.argv:
        STORE = sys.argv[sys.argv.index("--store") + 1]
        assert STORE in ("cow", "mor"), STORE
    sc.DST = f"/tmp/spark_graft_scale{sc.COPIES}"
    spark = get_spark()
    sc.build("documents")
    print(f"copies={sc.COPIES} legs={legs} store={STORE}")

    root = f"/tmp/spark_graft_dedup_scale{sc.COPIES}"
    if os.path.exists(root):
        shutil.rmtree(root)
    for leg in legs:
        {"dedup": leg_dedup, "text": leg_text, "ann": leg_ann}[leg](
            spark, root
        )


if __name__ == "__main__":
    main()
