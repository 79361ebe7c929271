"""RocksDB state store provider compatibility (100 TB posture).

The default HDFS-backed state store keeps all streaming state on the
JVM heap — at production key cardinalities that becomes the executor
OOM that kills long-running streams. Spark ships an off-heap RocksDB
provider (spark.sql.streaming.stateStore.providerClass) whose state
size is bounded by local disk instead; this test proves the engine's
streaming queries run unmodified on it and produce identical results,
so flipping the provider on a real cluster is a pure config change.

The provider is read from the session conf at query *start*, so setting
it around a run is enough — no separate SparkSession needed.
"""

from __future__ import annotations

from contextlib import contextmanager

from parquet_demo_spark.registry import all_queries

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextmanager
def _rocksdb_state(spark):
    old = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, old)


def test_windowed_agg_runs_on_rocksdb_state_store(spark, sf_smoke):
    q = all_queries()["q60_stream_tumbling"]
    baseline = [tuple(r) for r in q.spark(spark, sf_smoke).collect()]
    with _rocksdb_state(spark):
        rocks = [tuple(r) for r in q.spark(spark, sf_smoke).collect()]
    assert rocks == baseline
    assert len(rocks) > 0


def test_stream_dedup_runs_on_rocksdb_state_store(spark, sf_smoke):
    q = all_queries()["q87_stream_dedup"]
    baseline = [tuple(r) for r in q.spark(spark, sf_smoke).collect()]
    with _rocksdb_state(spark):
        rocks = [tuple(r) for r in q.spark(spark, sf_smoke).collect()]
    assert rocks == baseline
    assert len(rocks) > 0
