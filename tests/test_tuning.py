"""Laws of the scale-adaptive plan scope (tuning.py).

The scope may only ever change HOW a sub-threshold store operation is
planned (AQE staging, shuffle partition count), never WHAT it computes
— pinned here by running the same merge scoped and unscoped and
comparing the committed snapshots row-for-row.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from parquet_demo_spark import tuning
from parquet_demo_spark.sources.merge_store import ParquetMergeStore


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_plan_scope_small_pins_and_restores_conf(spark):
    before = {k: spark.conf.get(k) for k in tuning._SMALL_CONF}
    with tuning.plan_scope(spark, 1024) as applied:
        assert applied
        for k, v in tuning._SMALL_CONF.items():
            assert spark.conf.get(k) == v
        # nested scope composes: still pinned, one logical hold
        with tuning.plan_scope(spark, 1) as inner:
            assert inner
            assert tuning.scope_active()
        for k, v in tuning._SMALL_CONF.items():
            assert spark.conf.get(k) == v
    assert not tuning.scope_active()
    for k, v in before.items():
        assert spark.conf.get(k) == v


def test_plan_scope_big_or_unknown_is_a_noop(spark):
    before = {k: spark.conf.get(k) for k in tuning._SMALL_CONF}
    with tuning.plan_scope(spark, None) as applied:
        assert not applied
        assert {k: spark.conf.get(k) for k in tuning._SMALL_CONF} == before
    with tuning.plan_scope(
        spark, tuning.small_plan_threshold() + 1
    ) as applied:
        assert not applied
        assert {k: spark.conf.get(k) for k in tuning._SMALL_CONF} == before


def test_plan_scope_restores_on_error(spark):
    before = {k: spark.conf.get(k) for k in tuning._SMALL_CONF}
    with pytest.raises(RuntimeError):
        with tuning.plan_scope(spark, 1):
            raise RuntimeError("boom")
    for k, v in before.items():
        assert spark.conf.get(k) == v
    assert not tuning.scope_active()


def test_dir_bytes_stop_at_short_circuits(tmp_path):
    for i in range(5):
        (tmp_path / f"f{i}.parquet").write_bytes(b"x" * 1000)
    full = tuning.dir_bytes(str(tmp_path))
    assert full == 5000
    capped = tuning.dir_bytes(str(tmp_path), stop_at=1500)
    # short-circuit returns as soon as the total passes the cap — the
    # exact value is layout-dependent, the law is "past the cap"
    assert 1500 < capped <= full
    assert tuning.dir_bytes(str(tmp_path / "missing")) == 0


def test_plan_size_bytes_known_for_scans(spark, sf_smoke):
    df = spark.read.parquet(os.path.join(sf_smoke, "events.parquet"))
    size = tuning.plan_size_bytes(df)
    assert size is not None and size > 0


def test_scoped_merge_commits_identical_snapshot(spark, sf_smoke, tmp_path):
    ev = spark.read.parquet(os.path.join(sf_smoke, "events.parquet"))

    def build(root, env_bytes):
        old = os.environ.get(tuning._ENV)
        os.environ[tuning._ENV] = str(env_bytes)
        try:
            store = ParquetMergeStore(
                str(root),
                keys=("user_id", "event_type"),
                version_cols=("ts", "event_id"),
                num_buckets=4,
            )
            store.merge(ev.filter(F.col("event_id") % 2 == 0))
            store.merge(ev.filter(F.col("event_id") % 2 == 1))
            return _rows(store.read(spark))
        finally:
            if old is None:
                del os.environ[tuning._ENV]
            else:
                os.environ[tuning._ENV] = old

    scoped = build(tmp_path / "scoped", 64 << 20)
    unscoped = build(tmp_path / "unscoped", 0)  # 0 disables the scope
    assert scoped == unscoped
    # and the session conf came back to its ambient posture
    assert not tuning.scope_active()
