"""Custom stateful streaming operator via applyInPandasWithState (S30).

Where `session_window`/`window` cover declarative state, this is the
escape hatch for operator semantics Spark lacks: per-key mutable state
carried across micro-batches by the state store, with the group's rows
arriving as pandas batches.

The operator here is a per-user running profile (event count, exact
value cents, last event type by event-time) — the upsert-flavored
"latest state per key" shape the reference's Mongo ReplaceOne pipeline
maintains externally (`_bulk.py:108-116`), kept inside the engine
instead.

Determinism for the oracle check: the arithmetic is exact-integer
(cents), reductions are order-independent (sum/count/max-by-ts with
event_id tie-break), so the final state equals the batch SQL twin no
matter how many micro-batches the file source splits the input into.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from parquet_demo_spark.registry import register

_OUT_SCHEMA = (
    "user_id bigint, n_events bigint, value_cents bigint, last_event_type string"
)
_STATE_SCHEMA = "n bigint, cents bigint, last_us bigint, last_id bigint, last_type string"


def _update_user_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, cents, last_us, last_id, last_type = (
        state.get if state.exists else (0, 0, -1, -1, "")
    )
    for pdf in pdfs:
        n += len(pdf)
        # exact integer cents (value is a 2-decimal double)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
        us = pdf["ts"].astype("int64")  # already epoch-µs (source-normalized)
        batch_last = max(zip(us, pdf["event_id"], pdf["event_type"]))
        if (batch_last[0], batch_last[1]) > (last_us, last_id):
            last_us, last_id, last_type = (
                int(batch_last[0]),
                int(batch_last[1]),
                str(batch_last[2]),
            )
    state.update((n, cents, last_us, last_id, last_type))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_cents": [cents],
            "last_event_type": [last_type],
        }
    )


def user_profile_stream(spark: SparkSession, sf: str) -> DataFrame:
    """Raw-µs variant of the events stream → per-user stateful profile."""
    from parquet_demo_spark.streaming.windows import read_events_stream_us_long

    # ts arrives as int64 epoch-µs regardless of the fixture's physical
    # unit — exact integer math in the pandas updater, no float round-trip
    src = read_events_stream_us_long(spark, sf)
    return src.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_Q63_ORACLE = """
    WITH latest AS (
      SELECT user_id, event_type,
             -- µs-truncate like the operator (ns//1000): a fixture with
             -- sub-µs ts components must not silently diverge
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts) // 1000 DESC,
                                         event_id DESC) AS rn
      FROM events
    )
    SELECT e.user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents,
           MIN(l.event_type) AS last_event_type
    FROM events e
    JOIN latest l ON l.user_id = e.user_id AND l.rn = 1
    GROUP BY e.user_id
    ORDER BY e.user_id
    """


@register(
    "q63_stateful_user_profile",
    oracle=_Q63_ORACLE,
    doc="S30 custom stateful operator (applyInPandasWithState): per-user "
    "running profile — count, exact cents, latest event type by "
    "(ts, event_id) — state carried across micro-batches; final state "
    "hash-equals the batch SQL twin.",
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from parquet_demo_spark.streaming.windows import _stream_partitions

    agg = user_profile_stream(spark, sf)
    with _stream_partitions(spark):
        q = (
            agg.writeStream.outputMode("update")
            .format("memory")
            .queryName("q63_mem")
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(120)
        finally:
            q.stop()
        if not finished:
            # a partial memory table must not pose as the final state
            raise TimeoutError("q63 stateful stream did not finish")
    out = spark.table("q63_mem")
    # update mode emits one row per (user, batch); the last emission per
    # user is the final state — n_events is monotone across batches
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "value_cents", "last_event_type")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Spark 4 state API twin: transformWithStateInPandas (protobuf-gated)
# ---------------------------------------------------------------------------


class _UserProfileProcessor(StatefulProcessor):
    """Per-user running profile on the transformWithState API.

    Same semantics as ``_update_user_profile`` (q63): count, exact
    integer cents, latest event type by (event-time µs, event_id).
    transformWithState is the applyInPandasWithState successor — typed
    named state slots (value/list/map), timers, TTL — and requires the
    RocksDB state store provider, which is also the 100 TB posture
    (tests/test_rocksdb_state_store.py).
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "profile",
            "n BIGINT, cents BIGINT, last_us BIGINT, last_id BIGINT, "
            "last_type STRING",
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, cents, last_us, last_id, last_type = self._state.get()
        else:
            n, cents, last_us, last_id, last_type = 0, 0, -1, -1, ""
        for pdf in rows:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
            us = pdf["ts"].astype("int64")  # epoch-µs (source-normalized)
            batch_last = max(zip(us, pdf["event_id"], pdf["event_type"]))
            if (batch_last[0], batch_last[1]) > (last_us, last_id):
                last_us, last_id, last_type = (
                    int(batch_last[0]),
                    int(batch_last[1]),
                    str(batch_last[2]),
                )
        self._state.update((n, cents, last_us, last_id, last_type))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_cents": [cents],
                "last_event_type": [last_type],
            }
        )

    def close(self) -> None:
        pass


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _protobuf_descriptor_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


TWS_AVAILABLE = _protobuf_descriptor_available()

# transformWithState's state-server protocol needs google.protobuf with
# compiled descriptors, which this container lacks (pip installs are
# off-limits per the environment contract). The operator below is the
# complete, runnable Spark-4 twin of q63 — gated like the Mongo jar and
# the multimodal codecs: tests/test_transform_with_state.py runs it and
# asserts exact q63 parity wherever protobuf is present, and skips (not
# passes) here. q63 remains the registry's hash-checked stateful row.


def user_profile_transform_with_state(
    spark: SparkSession, sf: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from parquet_demo_spark.streaming.windows import (
        _run_to_memory,
        read_events_stream_us_long,
    )

    src = read_events_stream_us_long(spark, sf)
    agg = src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_UserProfileProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, _ROCKSDB_PROVIDER)
    try:
        out = _run_to_memory(agg, "q112_mem", mode="update")
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    latest = out.groupBy("user_id").agg(
        F.max(F.struct("n_events", "value_cents", "last_event_type")).alias(
            "m"
        )
    )
    return latest.select(
        "user_id",
        F.col("m.n_events").alias("n_events"),
        F.col("m.value_cents").alias("value_cents"),
        F.col("m.last_event_type").alias("last_event_type"),
    ).orderBy("user_id")
