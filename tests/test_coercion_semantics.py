"""Permissive-coercion parity (SURVEY §1.2 / §4.2 ANSI-off rationale):
the reference coerces leniently (None passthrough, best-effort casts);
the engine pins the same behavior via ansi.enabled=false, and writes
µs-precision timestamps like the reference does."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def test_invalid_casts_yield_null_not_error(spark):
    # ANSI off: bad string→int and overflow→cast produce NULL / wrap,
    # never an exception (the reference never raises on bad values
    # either — it passes them to pa.array and lets None through)
    df = spark.createDataFrame(
        [("12", "x"), ("not_a_number", "7"), (None, None)], "a string, b string"
    ).select(
        F.col("a").cast("bigint").alias("ai"),
        F.col("b").cast("double").alias("bd"),
    )
    rows = sorted(df.collect(), key=str)
    assert [tuple(r) for r in rows] == sorted(
        [(12, None), (None, 7.0), (None, None)], key=str
    )


def test_parquet_writes_are_microsecond_timestamps(spark, tmp_path):
    # session pins outputTimestampType=TIMESTAMP_MICROS, matching the
    # reference's µs writes (generate_parquet_from_ddl.py:39,54)
    p = str(tmp_path / "ts.parquet")
    spark.createDataFrame(
        [("2023-01-02 03:04:05.123456",)], "s string"
    ).select(F.col("s").cast("timestamp_ntz").alias("ts")).write.mode(
        "overwrite"
    ).parquet(p)
    import glob

    f = glob.glob(f"{p}/*.parquet")[0]
    t = pq.ParquetFile(f).schema_arrow.field("ts").type
    assert str(t) == "timestamp[us]"


def test_nanos_events_roundtrip_matches_duckdb(spark, sf_dir):
    # the ns→µs conversion in catalog.load equals DuckDB's reading of
    # the same file (SURVEY §1.2.2 unit down-conversion parity)
    import duckdb

    from parquet_demo_spark.catalog import load

    s = sorted(
        (r.event_id, r.ts.isoformat())
        for r in load(spark, sf_dir, "events").select("event_id", "ts").collect()
    )
    d = sorted(
        (eid, ts.isoformat())
        for eid, ts in duckdb.sql(
            f"SELECT event_id, ts FROM read_parquet('{sf_dir}/events.parquet')"
        ).fetchall()
    )
    assert s == d
