"""Watermark late-data semantics (S29): in append mode, events older
than the watermark when their window is finalized are DROPPED. The
complete-mode equivalence queries can't show this; this test feeds two
micro-batches (on-time, then very-late) through a checkpointed parquet
sink and asserts the drop."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def test_append_mode_drops_late_events(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    schema = "ts timestamp, k string"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "k")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "k", "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    # run 1: events up to 12:00 → checkpointed watermark ≈ 11:50
    write_batch(
        [
            (datetime(2024, 1, 1, 10, 0, 0), "a"),
            (datetime(2024, 1, 1, 12, 0, 0), "a"),
        ]
    )
    run_stream()

    # run 2: one on-time event (12:30) and one VERY late event (09:00 —
    # far below the 11:50 watermark, its window is already closed → drop)
    write_batch(
        [
            (datetime(2024, 1, 1, 12, 30, 0), "a"),
            (datetime(2024, 1, 1, 9, 0, 0), "a"),
        ]
    )
    run_stream()

    emitted = spark.read.parquet(out).collect()
    starts = {r.ws.hour for r in emitted}
    # the 09:00 late event must NOT appear in any finalized window
    assert 9 not in starts, f"late event leaked into output: {emitted}"
    # the 10:00 window was finalized with only its on-time content
    ten = [r for r in emitted if r.ws.hour == 10]
    assert ten and all(r.n == 1 for r in ten)
