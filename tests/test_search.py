"""Inverted-index retrieval: losslessness, storage pruning, phrase
positions, and incremental maintenance through the merge store."""

from __future__ import annotations

from parquet_demo_spark.plans import has_pushed_filters, physical_plan

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from parquet_demo_spark.operators.search import (
    inverted_index,
    search_all_terms,
    search_phrase,
    search_ranked_tfidf,
    write_index,
)

_DOCS = [
    Row(doc_id=0, text="key value key value store"),
    Row(doc_id=1, text="value key, VALUE; store!"),
    Row(doc_id=2, text="unrelated words only"),
    Row(doc_id=3, text="key alone without the other term"),
]


def test_index_is_lossless_tf_and_positions(spark):
    idx = {
        (r.term, r.doc_id): (r.tf, r.positions)
        for r in inverted_index(spark.createDataFrame(_DOCS)).collect()
    }
    assert idx[("key", 0)] == (2, [0, 2])
    assert idx[("value", 0)] == (2, [1, 3])
    # punctuation splits; case folds
    assert idx[("value", 1)] == (2, [0, 2])
    assert ("the", 3) in idx


def test_search_all_terms_conjunctive(spark):
    idx = inverted_index(spark.createDataFrame(_DOCS))
    got = {
        r.doc_id: r.tf_total
        for r in search_all_terms(idx, ["key", "value"]).collect()
    }
    assert got == {0: 4, 1: 3}  # doc 3 has 'key' only, doc 2 neither


def test_search_phrase_counts_adjacent_only(spark):
    idx = inverted_index(spark.createDataFrame(_DOCS))
    got = {
        r.doc_id: r.n_occ
        for r in search_phrase(idx, "key", "value").collect()
    }
    # doc 0: 'key value' twice; doc 1: 'key, VALUE' once (punctuation
    # is a token boundary, adjacency survives); docs 2/3 no match
    assert got == {0: 2, 1: 1}
    with pytest.raises(ValueError, match="differ"):
        search_phrase(idx, "key", "key")


def test_ranked_tfidf_rare_term_outranks_common(spark):
    docs = [
        Row(doc_id=i, text="common words here common") for i in range(9)
    ] + [Row(doc_id=9, text="rare common")]
    idx = inverted_index(spark.createDataFrame(docs))
    top = search_ranked_tfidf(idx, 10, ["rare", "common"], top_k=1).collect()
    assert top[0].doc_id == 9  # one 'rare' (idf ln10) beats tf=2 of idf≈0


def test_stored_index_prunes_to_term_buckets(spark, tmp_path):
    """A stored index partitioned by term bucket serves a query from
    the matching bucket dirs only — partition pruning, checked via the
    files the filtered scan actually references."""
    docs = spark.createDataFrame(_DOCS)
    path = str(tmp_path / "idx")
    write_index(inverted_index(docs, num_buckets=16), path)
    stored = spark.read.parquet(path)
    wanted = stored.filter(F.col("term") == "key")
    buckets = {r.bucket for r in wanted.select("bucket").distinct().collect()}
    assert len(buckets) == 1
    b = buckets.pop()
    pruned = stored.filter(F.col("bucket") == b).filter(
        F.col("term") == "key"
    )
    plan = physical_plan(pruned)
    # the partition filter on the bucket column reaches the scan (dir
    # pruning), and the term filter is pushed into the parquet reader
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf_lines and any(f"= {b})" in ln for ln in pf_lines)
    assert has_pushed_filters(pruned, "EqualTo(term,key)")
    # counting rows through the pruned path equals the unpruned filter
    assert pruned.count() == wanted.count() > 0


def test_index_incremental_maintenance_via_merge_store(spark, tmp_path):
    """Postings are keyed (term, doc_id): a corpus delta upserts its
    postings into a stored index without a rebuild, and search through
    the store equals search over a fresh full index."""
    from parquet_demo_spark.sources.merge_store import ParquetMergeStore

    store = ParquetMergeStore(
        str(tmp_path / "idx_store"),
        keys=("term", "doc_id"),
        num_buckets=8,
    )
    v0 = spark.createDataFrame(_DOCS[:2])
    store.merge(inverted_index(v0).drop("bucket"))
    # delta: doc 1 re-edited (its postings replace), doc 4 added
    delta = spark.createDataFrame(
        [
            Row(doc_id=1, text="key value rewritten"),
            Row(doc_id=4, text="key value key"),
        ]
    )
    store.merge(inverted_index(delta).drop("bucket"))
    # stale postings of doc 1 (terms no longer present) delete by key
    fresh_terms = inverted_index(delta).select("term", "doc_id")
    stale = (
        store.read(spark)
        .filter(F.col("doc_id") == 1)
        .select("term", "doc_id")
        .join(fresh_terms, ["term", "doc_id"], "left_anti")
    )
    store.delete_keys(stale)
    full = inverted_index(
        spark.createDataFrame([_DOCS[0]]).unionByName(delta)
    )
    got = {
        r.doc_id: r.tf_total
        for r in search_all_terms(store.read(spark), ["key", "value"]).collect()
    }
    want = {
        r.doc_id: r.tf_total
        for r in search_all_terms(full, ["key", "value"]).collect()
    }
    assert got == want == {0: 4, 1: 2, 4: 3}


def test_bm25_rare_term_and_length_normalization(spark):
    """BM25 behaviors tf-idf lacks: (a) a rare term outranks a common
    one at equal tf; (b) LENGTH NORMALIZATION — equal tf of the same
    term scores lower in a longer doc; (c) tf saturation — doubling tf
    far less than doubles the contribution (k1 cap)."""
    from parquet_demo_spark.operators.search import search_ranked_bm25

    docs = [
        Row(doc_id=0, text="rare common filler"),           # tf(rare)=1, short
        Row(doc_id=1, text="rare common " + "pad " * 20),   # tf(rare)=1, long
        Row(doc_id=2, text="common common filler pad"),     # tf(common)=2
        Row(doc_id=3, text="common filler pad pad"),
        Row(doc_id=4, text="filler pad pad pad"),
    ]
    idx = inverted_index(spark.createDataFrame(docs))
    got = {
        r.doc_id: r.score
        for r in search_ranked_bm25(idx, 5, ["rare", "common"]).collect()
    }
    # (a) doc0 (rare+common, short) beats doc2 (common only, tf=2)
    assert got[0] > got[2]
    # (b) same terms, same tf: long doc1 scores strictly below short doc0
    assert got[1] < got[0]
    # (c) saturation: doc2 has double the common-tf of doc3 but scores
    # < 2x doc3's score (same-ish length)
    assert got[2] < 2 * got[3]


def test_bm25_matches_reference_formula(spark):
    """Spot-check one score against the hand-computed Okapi formula."""
    import math

    from parquet_demo_spark.operators.search import search_ranked_bm25

    docs = [
        Row(doc_id=0, text="apple banana"),
        Row(doc_id=1, text="apple apple cherry cherry"),
        Row(doc_id=2, text="cherry date"),
    ]
    idx = inverted_index(spark.createDataFrame(docs))
    got = {
        r.doc_id: r.score
        for r in search_ranked_bm25(idx, 3, ["apple"]).collect()
    }
    n, df = 3, 2
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    avgdl = (2 + 4 + 2) / 3
    def bm25(tf, dl):
        return round(
            idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))), 6
        )
    assert got[0] == pytest.approx(bm25(1, 2), abs=1e-9)
    assert got[1] == pytest.approx(bm25(2, 4), abs=1e-9)
    assert 2 not in got


@pytest.mark.slow
def test_stream_maintained_index_equals_fresh_after_out_of_order_edits(
    spark, tmp_path
):
    """VERDICT r6 #7: readStream → foreachBatch → postings upsert +
    stale-delete keeps a store-backed index identical to a fresh full
    rebuild, even when doc edits arrive OUT OF ORDER across
    micro-batches (doc-level LWW by edit_ts)."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from parquet_demo_spark.operators.search import stream_maintain_index
    from parquet_demo_spark.sources.merge_store import ParquetMergeStore

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("edit_ts", T.LongType()),
        ]
    )
    # batch files arrive in listing order batch0, batch1, batch2 — but
    # doc 1's edits are delivered NEWEST FIRST (ts=3 before ts=2), and
    # doc 2 is edited to empty (all postings must disappear)
    batches = [
        [
            Row(doc_id=1, text="key value store", edit_ts=1),
            Row(doc_id=2, text="key alone", edit_ts=1),
        ],
        [
            Row(doc_id=1, text="value rewritten completely", edit_ts=3),
            Row(doc_id=3, text="key value key", edit_ts=1),
        ],
        [
            Row(doc_id=1, text="stale older edit", edit_ts=2),  # late
            Row(doc_id=2, text="", edit_ts=2),  # emptied
        ],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        scratch = str(tmp_path / f"scratch{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        [part] = glob.glob(os.path.join(scratch, "part-*.parquet"))
        shutil.move(part, str(src / f"batch{i}.parquet"))

    store = ParquetMergeStore(
        str(tmp_path / "idx_store"),
        keys=("term", "doc_id"),
        version_cols=("edit_ts",),
        num_buckets=8,
    )
    q = stream_maintain_index(
        spark, str(src), schema, store, str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(180)

    # ground truth: fresh full index over the LATEST edit of each doc
    final_docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="value rewritten completely", edit_ts=3),
            Row(doc_id=3, text="key value key", edit_ts=1),
        ],
        schema,
    )
    want = sorted(
        (r.term, r.doc_id, r.tf, tuple(r.positions))
        for r in inverted_index(final_docs).drop("bucket").collect()
    )
    got = sorted(
        (r.term, r.doc_id, r.tf, tuple(r.positions))
        for r in store.read(spark).select(
            "term", "doc_id", "tf", "positions"
        ).collect()
    )
    assert got == want
    # the emptied doc is fully gone; the stale ts=2 edit never applied
    assert not [g for g in got if g[1] == 2]
    assert ("stale", 1, 1, (0,)) not in got
    # and search through the maintained store matches the fresh index
    got_search = {
        r.doc_id: r.tf_total
        for r in search_all_terms(
            store.read(spark), ["key", "value"]
        ).collect()
    }
    assert got_search == {3: 3}


@pytest.mark.slow
def test_stale_edit_after_emptying_is_rejected_text_index(spark, tmp_path):
    """ADVICE r8 (medium), text leg: a doc edited-to-empty loses every
    posting row but must KEEP its LWW watermark, so a later out-of-order
    STALE edit cannot re-index stale text. Also pins that stale-key
    discovery comes from the watermark's recorded term set (no postings
    scan): doc 1's edit removes a term, whose posting must tombstone."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from parquet_demo_spark.operators.search import stream_maintain_index
    from parquet_demo_spark.sources.merge_store import (
        ParquetMergeStore,
        admission_watermarks,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("edit_ts", T.LongType()),
        ]
    )
    batches = [
        [
            Row(doc_id=1, text="alpha beta gamma", edit_ts=1),
            Row(doc_id=2, text="delta epsilon", edit_ts=1),
        ],
        [Row(doc_id=2, text="", edit_ts=5)],  # emptied at ts=5
        [
            # STALE (3 < 5) arriving AFTER the emptying: must NOT apply
            Row(doc_id=2, text="stale resurrection", edit_ts=3),
            # doc 1 re-edit drops 'gamma': its posting must tombstone
            # via the watermark's term set, not an index scan
            Row(doc_id=1, text="alpha beta", edit_ts=2),
        ],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        scratch = str(tmp_path / f"scratch{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        [part] = glob.glob(os.path.join(scratch, "part-*.parquet"))
        shutil.move(part, str(src / f"batch{i}.parquet"))
    store = ParquetMergeStore(
        str(tmp_path / "idx_store"),
        keys=("term", "doc_id"),
        version_cols=("edit_ts",),
        num_buckets=8,
    )
    q = stream_maintain_index(
        spark, str(src), schema, store, str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(180)
    got = sorted(
        (r.term, r.doc_id)
        for r in store.read(spark).select("term", "doc_id").collect()
    )
    assert got == [("alpha", 1), ("beta", 1)]
    # watermark rows survive the emptying, with term sets current
    wm = admission_watermarks(store, keys=("doc_id",))
    rows = {
        r.doc_id: (r.edit_ts, sorted(r.terms))
        for r in wm.read(spark).collect()
    }
    assert rows == {1: (2, ["alpha", "beta"]), 2: (5, [])}
