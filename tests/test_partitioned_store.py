"""PartitionedParquetMergeStore: partition pruning, metadata-only
retention, CDC across drops, and global snapshot isolation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from parquet_demo_spark.sources.partitioned_store import (
    PartitionedParquetMergeStore,
)


def _store(tmp_path, **kw):
    defaults = dict(
        keys=("day", "k"),
        partition_col="day",
        version_cols=("v",),
        num_buckets=2,
    )
    defaults.update(kw)
    return PartitionedParquetMergeStore(str(tmp_path / "pstore"), **defaults)


def _rows(df):
    return sorted((r.day, r.k, r.v, r.payload) for r in df.collect())


def _batch(spark, day_keys):
    return spark.createDataFrame(
        [
            Row(day=d, k=k, v=1, payload=f"{d}/{k}")
            for d, k in day_keys
        ]
    )


def test_partition_col_must_be_key(tmp_path):
    with pytest.raises(ValueError, match="partition_col must be one"):
        PartitionedParquetMergeStore(
            str(tmp_path / "x"), keys=("k",), partition_col="day"
        )


def test_merge_routes_and_read_prunes_partitions(spark, tmp_path):
    st = _store(tmp_path)
    st.merge(
        _batch(
            spark,
            [("d1", 1), ("d1", 2), ("d2", 1), ("d3", 5)],
        )
    )
    assert st.partitions() == ["d1", "d2", "d3"]
    # scoped read returns exactly the range's rows
    assert _rows(st.read(spark, partitions=("d1", "d2"))) == [
        ("d1", 1, 1, "d1/1"),
        ("d1", 2, 1, "d1/2"),
        ("d2", 1, 1, "d2/1"),
    ]
    # and opens strictly fewer files than the full read — the VERDICT
    # r6 #3 files-read drop, measured at the filesystem level
    assert st.files_read(partitions=("d1", "d1")) < st.files_read()
    # a range matching nothing: zero rows, zero files, schema intact
    assert st.read(spark, partitions=("zz", "zz")).count() == 0
    assert st.files_read(partitions=("zz", "zz")) == 0


def test_merge_touches_only_its_partitions(spark, tmp_path):
    st = _store(tmp_path)
    st.merge(_batch(spark, [("d1", 1), ("d2", 1)]))
    parts_v0 = st._parts(0)
    st.merge(_batch(spark, [("d2", 9)]))  # touches d2 only
    parts_v1 = st._parts(1)
    assert parts_v1["d1"] == parts_v0["d1"]  # untouched child pinned
    assert parts_v1["d2"]["version"] == parts_v0["d2"]["version"] + 1
    assert _rows(st.read(spark)) == [
        ("d1", 1, 1, "d1/1"),
        ("d2", 1, 1, "d2/1"),
        ("d2", 9, 1, "d2/9"),
    ]


def test_upsert_within_partition_replaces(spark, tmp_path):
    st = _store(tmp_path)
    st.merge(_batch(spark, [("d1", 1)]))
    st.merge(
        spark.createDataFrame([Row(day="d1", k=1, v=2, payload="NEW")])
    )
    assert _rows(st.read(spark)) == [("d1", 1, 2, "NEW")]


def test_drop_partition_is_metadata_only_with_time_travel(spark, tmp_path):
    st = _store(tmp_path)
    st.merge(_batch(spark, [("d1", 1), ("d2", 2)]))  # v0
    child_dir = os.path.join(st.root, "p=d1")
    files_before = sum(len(fs) for _, _, fs in os.walk(child_dir))
    v = st.drop_partition("d1")  # v1
    # metadata-only: not one file under the dropped partition changed
    assert sum(len(fs) for _, _, fs in os.walk(child_dir)) == files_before
    assert st.partitions() == ["d2"]
    assert _rows(st.read(spark)) == [("d2", 2, 1, "d2/2")]
    # time travel still sees the dropped partition
    assert ("d1", 1, 1, "d1/1") in _rows(st.read(spark, version=v - 1))
    with pytest.raises(ValueError, match="no live partition"):
        st.drop_partition("d1")


def test_changes_between_sees_drop_as_cdc_deletes(spark, tmp_path):
    st = _store(tmp_path)
    st.merge(_batch(spark, [("d1", 1), ("d1", 2), ("d2", 3)]))  # v0
    st.merge(_batch(spark, [("d3", 7)]))  # v1: new partition
    st.drop_partition("d1")  # v2: retention
    ch01 = st.changes_between(spark, 0, 1)
    assert sorted((r.day, r.k, r._change_type) for r in ch01.collect()) == [
        ("d3", 7, "insert")
    ]
    ch12 = st.changes_between(spark, 1, 2)
    assert sorted((r.day, r.k, r._change_type) for r in ch12.collect()) == [
        ("d1", 1, "delete"),
        ("d1", 2, "delete"),
    ]


def test_delete_where_prunes_to_partition_range(spark, tmp_path):
    st = _store(tmp_path)
    st.merge(_batch(spark, [("d1", 1), ("d2", 2), ("d3", 3)]))
    parts_v0 = st._parts(0)
    st.delete_where(spark, "k >= 0", partitions=("d2", "d2"))
    parts_v1 = st._parts(1)
    # only d2's child advanced — d1/d3 never even ran the delete scan
    assert parts_v1["d1"] == parts_v0["d1"]
    assert parts_v1["d3"] == parts_v0["d3"]
    assert parts_v1["d2"]["version"] == parts_v0["d2"]["version"] + 1
    assert _rows(st.read(spark)) == [
        ("d1", 1, 1, "d1/1"),
        ("d3", 3, 1, "d3/3"),
    ]


def test_vacuum_removes_only_dropped_partitions(spark, tmp_path):
    st = _store(tmp_path)
    st.merge(_batch(spark, [("d1", 1), ("d2", 2)]))  # v0
    st.drop_partition("d1")  # v1
    removed = st.vacuum(keep_last=1)
    assert removed == ["p=d1"]
    assert not os.path.exists(os.path.join(st.root, "p=d1"))
    assert _rows(st.read(spark)) == [("d2", 2, 1, "d2/2")]
    # keeping 2 versions keeps the dropped partition's files
    st2 = _store(tmp_path, num_buckets=2)
    st2root = str(tmp_path / "pstore2")
    st2 = PartitionedParquetMergeStore(
        st2root, keys=("day", "k"), partition_col="day",
        version_cols=("v",), num_buckets=2,
    )
    st2.merge(_batch(spark, [("d1", 1), ("d2", 2)]))
    st2.drop_partition("d1")
    assert st2.vacuum(keep_last=2) == []


def test_reopen_config_mismatch_raises(spark, tmp_path):
    st = _store(tmp_path)
    st.merge(_batch(spark, [("d1", 1)]))
    with pytest.raises(ValueError, match="different config"):
        PartitionedParquetMergeStore(
            st.root, keys=("day", "k"), partition_col="day",
            version_cols=("v",), num_buckets=4,
        )


def test_null_partition_value_raises(spark, tmp_path):
    st = _store(tmp_path)
    with pytest.raises(ValueError, match="NULL"):
        st.merge(
            spark.createDataFrame(
                [
                    Row(day="d1", k=1, v=1, payload="x"),
                    Row(day=None, k=2, v=1, payload="y"),
                ]
            )
        )


def test_count_rows_scoped(spark, tmp_path):
    st = _store(tmp_path)
    st.merge(_batch(spark, [("d1", 1), ("d1", 2), ("d2", 3)]))
    assert st.count_rows() == 3
    assert st.count_rows(partitions=("d1", "d1")) == 2


def test_drop_then_remerge_does_not_resurrect_old_rows(spark, tmp_path):
    """Dropping a partition and later merging NEW rows into the same
    value must yield ONLY the new rows: the re-created partition gets a
    fresh epoch child dir (p=<val>@1), never a re-pin of the dropped
    child (which still holds the pre-drop rows for time travel)."""
    st = _store(tmp_path)
    st.merge(_batch(spark, [("d1", 1), ("d1", 2), ("d2", 3)]))  # v0
    st.drop_partition("d1")  # v1
    st.merge(_batch(spark, [("d1", 9)]))  # v2: re-created partition
    assert _rows(st.read(spark)) == [
        ("d1", 9, 1, "d1/9"),  # ONLY the new row — k=1/2 stay dropped
        ("d2", 3, 1, "d2/3"),
    ]
    assert st._parts(2)["d1"]["dir"] == "p=d1@1"
    # time travel before the drop still resolves the OLD epoch dir
    assert _rows(st.read(spark, version=0)) == [
        ("d1", 1, 1, "d1/1"),
        ("d1", 2, 1, "d1/2"),
        ("d2", 3, 1, "d2/3"),
    ]
    # CDC across the drop+re-create nets old rows out, new row in
    ch = st.changes_between(spark, 0, 2)
    assert sorted((r.day, r.k, r._change_type) for r in ch.collect()) == [
        ("d1", 1, "delete"),
        ("d1", 2, "delete"),
        ("d1", 9, "insert"),
    ]
    # vacuum keeping only the current version removes the old epoch dir
    removed = st.vacuum(keep_last=1)
    assert removed == ["p=d1"]
    assert _rows(st.read(spark)) == [
        ("d1", 9, 1, "d1/9"),
        ("d2", 3, 1, "d2/3"),
    ]


def test_noop_merge_and_delete_burn_no_version(spark, tmp_path):
    """Empty batches and no-match deletes return the current version
    without committing — the child store's no-op law, one level up."""
    st = _store(tmp_path)
    st.merge(_batch(spark, [("d1", 1)]))  # v0
    empty = _batch(spark, [("d1", 1)]).filter(F.col("k") < 0)
    assert st.merge(empty) == 0
    assert st.delete_where(spark, "k > 100") == 0
    assert st.current_version() == 0
    with pytest.raises(ValueError, match="empty batch"):
        PartitionedParquetMergeStore(
            str(tmp_path / "fresh"), keys=("day", "k"),
            partition_col="day", version_cols=("v",),
        ).merge(empty)


def test_compact_children_one_global_commit(spark, tmp_path):
    """OPTIMIZE compacts fragmented buckets in every live child under
    ONE global version; rows, pruning, and time travel are unchanged."""
    st = _store(tmp_path)
    # AQE coalesces the collapse shuffle to one partition at this size,
    # which hides fragmentation; real fragmentation comes from
    # multi-partition writes, so pin that shape (the child compact
    # test's recipe)
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        st.merge(
            _batch(spark, [(d, k) for d in ("d1", "d2") for k in range(12)])
        )
    finally:
        spark.conf.set(coalesce_key, prev)
    before = _rows(st.read(spark))
    files_before = st.files_read()
    v = st.compact(spark, min_files=2)
    assert v == st.current_version()
    assert _rows(st.read(spark)) == before
    assert st.files_read() < files_before
    # compacting the already-compact store is a no-op, no version burns
    assert st.compact(spark, min_files=2) is None
    assert st.current_version() == v
    # time travel to the pre-compaction version still works
    assert _rows(st.read(spark, version=v - 1)) == before


def test_clean_orphans_removes_manifests_above_pointer(spark, tmp_path):
    """A crash between the manifest CAS and the pointer swap leaves an
    orphan global manifest; readers never see it, clean_orphans
    reclaims it, and the next commit retakes the version."""
    import json

    st = _store(tmp_path)
    st.merge(_batch(spark, [("d1", 1)]))  # v0
    # simulate the crashed writer: manifest for v1 exists, pointer at v0
    orphan = os.path.join(st.root, "v00001")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "manifest.json"), "w") as fh:
        json.dump({"partitions": {}}, fh)
    assert st.current_version() == 0
    assert _rows(st.read(spark)) == [("d1", 1, 1, "d1/1")]
    assert st.clean_orphans() == ["v00001"]
    # the retried write takes v1 cleanly
    st.merge(_batch(spark, [("d2", 2)]))
    assert st.current_version() == 1
