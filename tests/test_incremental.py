"""Conditional merge, CDC pre-images, and incremental view refresh.

Covers the row-level laws the q134/q135 registry hash-checks can't see
from their final aggregates alone: only-if-newer survivor selection,
order-independence and replay idempotence of conditional merges, the
pre/post pairing discipline of the CDC feed, and exactness of the
delta-maintained view against full recompute on adversarial updates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from parquet_demo_spark.sources.merge_store import (
    ParquetMergeStore,
    changes_between,
)


def _store(tmp_path, name="store", **kw):
    defaults = dict(keys=("k",), version_cols=("v",), num_buckets=4)
    defaults.update(kw)
    return ParquetMergeStore(str(tmp_path / name), **defaults)


def _rows(df):
    return sorted((r.k, r.v, r.payload) for r in df.collect())


def test_conditional_merge_only_if_newer(spark, tmp_path):
    """A stale batch row must NOT replace a newer stored row; a newer
    one must. Unconditional merge would take the batch in both cases."""
    st = _store(tmp_path)
    st.merge(
        spark.createDataFrame(
            [Row(k=1, v=5, payload="new"), Row(k=2, v=5, payload="old")]
        )
    )
    st.merge(
        spark.createDataFrame(
            [Row(k=1, v=3, payload="stale"), Row(k=2, v=7, payload="fresh")]
        ),
        conditional=True,
    )
    assert _rows(st.read(spark)) == [
        (1, 5, "new"),
        (2, 7, "fresh"),
    ]


def test_conditional_merge_tie_goes_to_batch(spark, tmp_path):
    """Equal version: the replacement wins (ReplaceOne's upsert bias),
    so re-delivering the same row is a no-op in content terms."""
    st = _store(tmp_path)
    st.merge(spark.createDataFrame([Row(k=1, v=5, payload="a")]))
    st.merge(
        spark.createDataFrame([Row(k=1, v=5, payload="b")]),
        conditional=True,
    )
    assert _rows(st.read(spark)) == [(1, 5, "b")]


def test_conditional_merge_null_version_loses(spark, tmp_path):
    st = _store(tmp_path)
    st.merge(spark.createDataFrame([Row(k=1, v=5, payload="real")]))
    st.merge(
        spark.createDataFrame(
            [(1, None, "null-version")], "k: bigint, v: bigint, payload: string"
        ),
        conditional=True,
    )
    assert _rows(st.read(spark)) == [(1, 5, "real")]


def test_conditional_merge_order_independent_and_idempotent(
    spark, tmp_path
):
    """The q135 guarantee, at row level: any delivery order of the same
    batch set — including re-delivery — converges to the same state."""
    batches = [
        [Row(k=i, v=j, payload=f"{i}@{j}") for i in range(6)]
        for j in (2, 1, 3)
    ]
    final = None
    for order in ([0, 1, 2], [2, 1, 0], [1, 2, 0, 2, 1]):
        st = _store(tmp_path, name=f"store_{''.join(map(str, order))}")
        for b in order:
            st.merge(spark.createDataFrame(batches[b]), conditional=True)
        got = _rows(st.read(spark))
        assert all(v == 3 for _, v, _ in got)
        if final is None:
            final = got
        assert got == final


def test_changes_preimage_pairing(spark, tmp_path):
    """Every updated key emits exactly one pre + one post; the pre is
    the v_from row verbatim; inserts emit no pre; identical rewrites
    emit nothing."""
    st = _store(tmp_path, num_buckets=8)
    st.merge(
        spark.createDataFrame(
            [Row(k=i, v=1, payload=str(i)) for i in range(16)]
        )
    )
    st.merge(
        spark.createDataFrame(
            [
                Row(k=1, v=2, payload="one-b"),
                Row(k=2, v=1, payload="2"),  # identical rewrite
                Row(k=99, v=1, payload="ninety-nine"),
            ]
        )
    )
    ch = changes_between(st, spark, 0, 1, include_preimages=True)
    got = sorted(
        (r.k, r.v, r.payload, r._change_type) for r in ch.collect()
    )
    assert got == [
        (1, 1, "1", "update_preimage"),
        (1, 2, "one-b", "update_postimage"),
        (99, 1, "ninety-nine", "insert"),
    ]


def test_changes_preimage_where_keeps_pairs_together(spark, tmp_path):
    """With a `where` range, a qualifying POST-image brings its pre
    along even if the pre itself is outside the range — the pair is
    what an incremental aggregate needs."""
    st = _store(tmp_path, num_buckets=4)
    st.merge(
        spark.createDataFrame(
            [Row(k=1, v=1, payload="lo"), Row(k=2, v=1, payload="lo2")]
        )
    )
    st.merge(
        spark.createDataFrame(
            [
                Row(k=1, v=100, payload="hi"),  # post qualifies, pre not
                Row(k=2, v=2, payload="lo2-b"),  # post does not qualify
            ]
        )
    )
    ch = changes_between(
        st, spark, 0, 1, where={"v": (50, None)}, include_preimages=True
    )
    got = sorted((r.k, r.v, r._change_type) for r in ch.collect())
    assert got == [
        (1, 1, "update_preimage"),
        (1, 100, "update_postimage"),
    ]


@pytest.mark.parametrize("seed", [0, 1])
def test_incremental_refresh_equals_recompute(spark, tmp_path, seed):
    """Adversarial delta-maintenance check on synthetic data: random
    updates that move keys' values up AND down, inserts into new and
    existing groups, a group that exists only after the delta. The
    incrementally-refreshed view must equal the recompute exactly."""
    from parquet_demo_spark.operators.incremental import (
        _mv_agg,
        refresh_incremental,
    )

    def ev_row(uid, etype, eid, val):
        return Row(
            user_id=uid, event_type=etype, event_id=eid, value=val
        )

    base = [
        ev_row(u, t, 10 * u + i, float(u * 7 + i) / 3.0)
        for u in range(1, 20)
        for i, t in enumerate(["click", "view"])
    ]
    delta = (
        # move values down (negative net delta) and up
        [ev_row(u, "click", 10 * u, -5.0 * ((u + seed) % 3)) for u in range(1, 10)]
        # inserts into an existing group
        + [ev_row(100 + u, "view", 9000 + u, 1.25 * u) for u in range(3)]
        # a group born in the delta
        + [ev_row(7, "purchase", 777, 19.99)]
    )
    st = ParquetMergeStore(
        str(tmp_path / "store"),
        keys=("user_id", "event_type"),
        version_cols=("event_id",),
        num_buckets=4,
    )
    st.merge(spark.createDataFrame(base))
    mv0 = _mv_agg(st.read(spark, version=0))
    st.merge(spark.createDataFrame(delta))
    cdc = changes_between(st, spark, 0, 1, include_preimages=True)
    inc = refresh_incremental(mv0, cdc)
    full = _mv_agg(st.read(spark, version=1))
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert canon(inc) == canon(full)


def test_streaming_conditional_ingest_replay_converges(spark, tmp_path):
    """q135's sink contract: re-running the whole stream over the same
    files (fresh checkpoint, same store) leaves the store unchanged —
    at-least-once delivery + conditional merge = exactly-once state."""
    import os

    from parquet_demo_spark.sources.merge_store import (
        stream_merge_into_store,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    df = spark.createDataFrame(
        [Row(k=i % 5, v=i, payload=f"p{i}") for i in range(20)]
    )
    df.coalesce(1).write.parquet(str(tmp_path / "stage"))
    part = next(
        f
        for f in os.listdir(str(tmp_path / "stage"))
        if f.startswith("part-")
    )
    os.rename(
        os.path.join(str(tmp_path / "stage"), part),
        os.path.join(src, "a.parquet"),
    )
    st = _store(tmp_path)
    for attempt in range(2):
        q = stream_merge_into_store(
            spark,
            src,
            df.schema,
            st,
            str(tmp_path / f"ckpt{attempt}"),
            conditional=True,
        )
        q.awaitTermination()
    got = _rows(st.read(spark))
    assert got == [(i, 15 + i, f"p{15 + i}") for i in range(5)]


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_change_feed_matches_snapshot_diff(spark, tmp_path):
    """The stored feed must be row-identical to the after-the-fact
    snapshot diff (insert + update pre/post, identical rewrites
    silent) — same law, O(delta) read."""
    st = _store(tmp_path, num_buckets=8)
    st.merge(
        spark.createDataFrame(
            [Row(k=i, v=1, payload=str(i)) for i in range(16)]
        ),
        write_change_feed=True,
    )
    st.merge(
        spark.createDataFrame(
            [
                Row(k=1, v=2, payload="one-b"),
                Row(k=2, v=1, payload="2"),  # identical rewrite
                Row(k=99, v=1, payload="ninety-nine"),
            ]
        ),
        write_change_feed=True,
    )
    feed0 = st.change_feed(spark, 0)
    assert set(r._change_type for r in feed0.collect()) == {"insert"}
    assert feed0.count() == 16
    feed1 = st.change_feed(spark, 1)
    diff = changes_between(st, spark, 0, 1, include_preimages=True)
    assert _canon(feed1) == _canon(diff)


def test_change_feed_conditional_stale_batch_is_silent(spark, tmp_path):
    st = _store(tmp_path)
    st.merge(
        spark.createDataFrame([Row(k=1, v=5, payload="new")]),
        write_change_feed=True,
    )
    st.merge(
        spark.createDataFrame([Row(k=1, v=3, payload="stale")]),
        conditional=True,
        write_change_feed=True,
    )
    assert st.change_feed(spark, 1).count() == 0
    # and a real change still reports
    st.merge(
        spark.createDataFrame([Row(k=1, v=9, payload="newer")]),
        conditional=True,
        write_change_feed=True,
    )
    got = sorted(
        (r.k, r.v, r._change_type)
        for r in st.change_feed(spark, 2).collect()
    )
    assert got == [(1, 5, "update_preimage"), (1, 9, "update_postimage")]


def test_change_feed_absent_raises_and_vacuum_reclaims(spark, tmp_path):
    import os

    st = _store(tmp_path)
    st.merge(
        spark.createDataFrame([Row(k=1, v=1, payload="a")]),
        write_change_feed=True,
    )
    st.merge(spark.createDataFrame([Row(k=1, v=2, payload="b")]))
    with pytest.raises(ValueError, match="no stored change feed"):
        st.change_feed(spark, 1)
    st.merge(
        spark.createDataFrame([Row(k=1, v=3, payload="c")]),
        write_change_feed=True,
    )
    removed = st.vacuum(keep_last=1)
    assert any(
        r.startswith(os.path.join("changes", "v00000")) for r in removed
    )  # dirs carry a per-commit writer-token suffix
    # the kept version's feed still reads
    assert st.change_feed(spark, 2).count() == 2  # pre + post


def test_change_feed_with_schema_evolution(spark, tmp_path):
    st = _store(tmp_path)
    st.merge(
        spark.createDataFrame([Row(k=1, v=1, payload="a")]),
        write_change_feed=True,
    )
    st.merge(
        spark.createDataFrame([Row(k=1, v=2, payload="a2", extra=7)]),
        allow_schema_evolution=True,
        write_change_feed=True,
    )
    got = sorted(
        (r.k, r.v, r.payload, r.extra, r._change_type)
        for r in st.change_feed(spark, 1).collect()
    )
    assert got == [
        (1, 1, "a", None, "update_preimage"),
        (1, 2, "a2", 7, "update_postimage"),
    ]
