"""Event-time windowed streaming aggregations (S29/S30).

Each query here REALLY runs Structured Streaming: readStream over the
events parquet (micro-batches via maxFilesPerTrigger-style file source),
event-time windows + watermark, memory sink, availableNow trigger — then
returns the materialized result as a static DataFrame so the driver can
hash-check it against the batch oracle (batch-stream equivalence,
SURVEY §2B preamble).

Scale posture: in production the file source becomes Kafka; watermarks
bound state (late events beyond 1 hour are dropped in append mode), and
session windows use the built-in session_window state merging. The
events fixture arrives out of ts-order (FIXTURES.md) so watermark
handling is genuinely exercised.

complete-output memory sink is used for the equivalence check because
append mode only emits windows the watermark has passed — with a finite
fixture the final windows would be withheld; complete mode emits the
full converged state, which is exactly what the batch twin computes.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_demo_spark.functions import dsum, epoch_us
from parquet_demo_spark.registry import register


def _events_ts_type(sf: str) -> T.DataType:
    """Spark type for the fixture's ``ts`` column, from the parquet footer.

    File streams require an explicit schema, and the fixture's physical
    ts type has varied across driver releases — timestamp[ns] (Spark
    reads raw int64 under ``nanosAsLong``, as catalog.load handles for
    the batch side) vs naive timestamp[us] (TIMESTAMP_NTZ). Hard-coding
    either breaks the other, so the schema derives from the footer: a
    single driver-side metadata read, no data scanned.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_schema(_events_files(sf)[0]).field("ts").type
    if pa.types.is_timestamp(t) and t.unit != "ns":
        return T.TimestampType() if t.tz else T.TimestampNTZType()
    return T.LongType()


def _events_files(sf: str) -> list[str]:
    """The fixture's events parquet file(s): ``events.parquet`` is a
    single file in the driver fixtures but a directory of part files in
    multi-file layouts (bench rewrite, any real table)."""
    p = os.path.join(sf, "events.parquet")
    if os.path.isdir(p):
        parts = sorted(
            os.path.join(p, f)
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )
        if not parts:
            raise FileNotFoundError(f"no part files under {p}")
        return parts
    return [p]


def events_schema(sf: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", _events_ts_type(sf)),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _stream_dir(sf: str) -> str:
    """File stream sources need a directory of leaf files; expose the
    events file(s) via symlinks under /tmp (the fixture dir is read-only
    and mixes tables; a directory-shaped events.parquet must contribute
    its part files directly — the stream source does not recurse)."""
    import shutil

    d = os.path.join(
        tempfile.gettempdir(), "spark_graft_stream", sf.strip("/").replace("/", "_")
    )
    targets = _events_files(sf)
    want = {
        (f"part{i:05d}.parquet" if len(targets) > 1 else "events.parquet"):
        os.path.realpath(t)
        for i, t in enumerate(targets)
    }
    # rebuild on any drift: dangling links (fixture recreated elsewhere)
    # or a stale/different file set must be re-pointed, never mixed
    if os.path.isdir(d):
        have = {
            f: os.path.realpath(os.path.join(d, f)) for f in os.listdir(d)
        }
        if have == want:
            return d
        shutil.rmtree(d)
    os.makedirs(d)
    for name, target in want.items():
        os.symlink(target, os.path.join(d, name))
    return d


def _raw_events_stream(spark: SparkSession, sf: str) -> DataFrame:
    return (
        spark.readStream.schema(events_schema(sf))
        .option("maxFilesPerTrigger", 1)
        .parquet(_stream_dir(sf))
    )


def read_events_stream(spark: SparkSession, sf: str) -> DataFrame:
    """Events stream with ``ts`` normalized to a µs TIMESTAMP.

    ns fixture: integral div (epoch-ns exceeds double's exact-integer
    range). NTZ fixture: plain cast — the session timezone is pinned to
    UTC (``__spark_entry__._configure`` / session.py), so the cast is a
    bit-identical reinterpretation, matching the DuckDB oracle's naive
    timestamps.
    """
    stream = _raw_events_stream(spark, sf)
    t = stream.schema["ts"].dataType
    if isinstance(t, T.LongType):
        return stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    if isinstance(t, T.TimestampNTZType):
        return stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def read_events_stream_us_long(spark: SparkSession, sf: str) -> DataFrame:
    """Events stream with ``ts`` as raw int64 epoch-MICROSECONDS.

    The stateful operators (q63 and its transformWithState twin) do
    exact integer event-time comparisons in pandas; handing them a
    unit-normalized int64 keeps the Python side unit-blind across
    fixture layouts.
    """
    stream = _raw_events_stream(spark, sf)
    t = stream.schema["ts"].dataType
    if isinstance(t, T.LongType):
        return stream.withColumn("ts", F.expr("ts div 1000"))
    return stream.withColumn("ts", epoch_us("ts"))


from contextlib import contextmanager

# State-store partition count: each streaming shuffle partition carries
# its own state-store instance, so oversizing it buys pure overhead
# (measured: 32→4 partitions cut a fixture-scale tumbling query 2.3s→
# 1.3s; 8→4 a further ~15% across the streaming suite). On a cluster,
# size to key cardinality / executor count; the fixture's key spaces
# (≤1000 users, ≤200 windows) want a small number.
STREAM_STATE_PARTITIONS = 4


@contextmanager
def _stream_partitions(spark: SparkSession, n: int = STREAM_STATE_PARTITIONS):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _run_to_memory(df: DataFrame, name: str, mode: str = "complete") -> DataFrame:
    """Execute a streaming aggregation to completion; return its result."""
    with _stream_partitions(df.sparkSession):
        q = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(120)
        finally:
            q.stop()
        if not finished:
            # a timed-out stream would leave a PARTIAL memory table —
            # surfacing it as the query result would be silent corruption
            raise TimeoutError(f"streaming query {name} did not finish")
    return df.sparkSession.table(name)


@register(
    "q60_stream_tumbling",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS wstart,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY wstart, event_type
    ORDER BY wstart, event_type
    """,
    doc="S29 streaming tumbling window (1h) + watermark, availableNow "
    "trigger, memory sink; hash-checked against the batch twin "
    "(batch-stream equivalence).",
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    agg = (
        read_events_stream(spark, sf)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
    )
    out = _run_to_memory(agg, "q60_mem")
    return out.select(
        F.col("w.start").alias("wstart"), "event_type", "n", "sum_value"
    ).orderBy("wstart", "event_type")


@register(
    "q61_stream_sliding",
    oracle="""
    SELECT wstart, event_type, n FROM (
      SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP)
               - k * INTERVAL '1 hour' AS wstart,
             event_type, COUNT(*) AS n
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
      GROUP BY wstart, event_type)
    ORDER BY wstart, event_type
    """,
    doc="S29 streaming sliding window (2h length, 1h slide): each event "
    "lands in two windows; oracle materializes the same two buckets per "
    "event.",
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    agg = (
        read_events_stream(spark, sf)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    out = _run_to_memory(agg, "q61_mem")
    return out.select(
        F.col("w.start").alias("wstart"), "event_type", "n"
    ).orderBy("wstart", "event_type")


@register(
    "q62_stream_session",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="S30 streaming session windows (30 min gap) via session_window "
    "state merging; oracle is the classic batch sessionization "
    "(lag + gap-flag + cumulative count). Per-user session/event counts.",
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    agg = (
        read_events_stream(spark, sf)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_in_session"))
    )
    sessions = _run_to_memory(agg, "q62_mem")
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.sum("n_in_session").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "q77_stream_append_filesink",
    oracle="""
    WITH wm AS (SELECT MAX(ts) - INTERVAL '1 hour' AS w FROM events)
    SELECT wstart, event_type, n, sum_value FROM (
      SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS wstart,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY wstart, event_type)
    WHERE wstart + INTERVAL '1 hour' <= (SELECT w FROM wm)
    ORDER BY wstart, event_type
    """,
    doc="S29 PRODUCTION shape: append-mode streaming aggregation to a "
    "checkpointed parquet FILE sink (not complete+memory). Append mode "
    "emits only windows the watermark (max event time - 1h) has closed; "
    "the batch oracle reproduces that as windows with "
    "end <= max(ts) - 1h. The whole fixture arrives as one micro-batch "
    "(single parquet file), so no event is late-dropped and the emitted "
    "set is deterministic; late-drop semantics are separately asserted "
    "in tests/test_watermark_late_data.py.",
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    base = tempfile.mkdtemp(prefix="q77_append_")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ck")
    emit = (
        read_events_stream(spark, sf)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("wstart"), "event_type", "n", "sum_value"
        )
    )
    with _stream_partitions(spark):
        q = (
            emit.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(120)
        finally:
            q.stop()
        if not finished:
            raise TimeoutError("q77 append stream did not finish")
    return spark.read.parquet(out).orderBy("wstart", "event_type")
