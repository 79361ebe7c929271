"""ETL sink paths (SURVEY build plan steps 5–6): streaming foreachBatch
→ parquet (the R13 pipeline shape with a file sink), and partitioned
writes with partition pruning (the reference's stated future work)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.io import write_partitioned
from parquet_demo_spark.plans import physical_plan
from parquet_demo_spark.streaming.windows import read_events_stream


def test_foreachbatch_parquet_sink(spark, sf_dir, tmp_path):
    """R13 re-expressed: stream → foreachBatch → partition-parallel
    parquet appends; row-count conservation checked end-to-end."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(batch_df, epoch_id):
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(out)

    q = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    n_src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    sunk = spark.read.parquet(out)
    assert sunk.count() == n_src
    assert "epoch" in sunk.columns


def test_partitioned_write_and_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    # catalog.load normalizes ts across fixture layouts (ns-as-long vs
    # native µs timestamps); to_date accepts either timestamp flavor
    events = load(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.col("ts"))
    )
    write_partitioned(events, out, ["day"])

    # hive layout exists
    assert glob.glob(f"{out}/day=*"), "expected day= partition dirs"

    # a partition filter prunes at planning time: the scan's partition
    # count collapses to 1 directory
    one_day = spark.read.parquet(out).filter(F.col("day") == "2024-01-02")
    plan = physical_plan(one_day)
    assert "PartitionFilters" in plan
    total = spark.read.parquet(out).count()
    assert one_day.count() < total
