"""Mongo ingest pipeline (R10–R14) exercised WITHOUT a live mongod.

The connector jar is absent in this container, so the last-hop write is
swapped for a parquet-twin collection that implements the connector's
replace-by-idFieldList semantics (= the reference's ReplaceOne upsert,
`examples/ingest_parquet_to_mongo_bulk.py` `_convert_and_submit`:
ReplaceOne(filter=PK fields, doc, upsert=True)). Everything upstream of
the sink — source read, LWW collapse, option building, foreachBatch
streaming machinery with checkpoints — is the real code path.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquet_demo_spark.registry import all_queries
from parquet_demo_spark.sources.mongo import (
    stream_parquet_to_mongo,
    write_options,
    write_parquet_to_mongo,
)


class FakeMongoCollection:
    """Parquet-dir-backed collection with connector write semantics.

    ``operationType=replace`` + ``idFieldList`` → delete-then-insert by
    PK (ReplaceOne with upsert=True); otherwise plain insert_many.
    """

    def __init__(self, path: str):
        self.path = path
        self.batches = 0

    def writer(self):
        def write(df: DataFrame, opts: dict) -> None:
            # the ingest path must request the reference's bulk defaults
            assert opts["ordered"] == "false"
            self.batches += 1
            if opts.get("operationType") == "replace":
                self._replace(df, opts["idFieldList"].split(","))
            else:
                df.write.mode("append").parquet(self.path)

        return write

    def _replace(self, new: DataFrame, pk: list[str]) -> None:
        spark = new.sparkSession
        if os.path.isdir(self.path):
            cur = spark.read.parquet(self.path)
            keep = cur.join(new.select(*pk).distinct(), on=pk, how="left_anti")
            merged = keep.unionByName(new)
        else:
            merged = new
        tmp = self.path + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self.path, ignore_errors=True)
        os.rename(tmp, self.path)

    def df(self, spark) -> DataFrame:
        return spark.read.parquet(self.path)


def test_batch_upsert_matches_q24_lww(spark, sf_smoke, tmp_path):
    """Upsert-ingest of events by (user_id, event_type) PK with
    (ts, event_id) version order must leave exactly the q24
    last-write-wins state in the collection."""
    coll = FakeMongoCollection(str(tmp_path / "coll"))
    n = write_parquet_to_mongo(
        spark,
        os.path.join(sf_smoke, "events.parquet"),
        "db",
        "events",
        upsert_keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        writer=coll.writer(),
    )
    got = (
        coll.df(spark)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()[0]
    )
    expected = (
        all_queries()["q24_upsert_latest"].spark(spark, sf_smoke).collect()[0]
    )
    assert n == got.n == expected.n
    assert got.sum_value == pytest.approx(expected.sum_value)


def test_batch_insert_appends_all_rows(spark, sf_smoke, tmp_path):
    coll = FakeMongoCollection(str(tmp_path / "coll"))
    src = os.path.join(sf_smoke, "region.parquet")
    n = write_parquet_to_mongo(spark, src, "db", "region", writer=coll.writer())
    assert coll.df(spark).count() == n == spark.read.parquet(src).count()


def test_dry_run_counts_without_writing(spark, sf_smoke, tmp_path):
    coll = FakeMongoCollection(str(tmp_path / "coll"))
    n = write_parquet_to_mongo(
        spark,
        os.path.join(sf_smoke, "region.parquet"),
        "db",
        "region",
        dry_run=True,
        writer=coll.writer(),
    )
    assert n > 0 and coll.batches == 0 and not os.path.isdir(coll.path)


def test_streaming_upsert_across_microbatches(spark, tmp_path):
    """foreachBatch ingest with replace semantics: a later micro-batch
    must overwrite earlier docs with the same PK (reference
    `_stream.py:102-181` behavior, minus the thread pool)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    coll = FakeMongoCollection(str(tmp_path / "coll"))
    schema = "k bigint, v bigint"

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        q = stream_parquet_to_mongo(
            spark,
            src,
            schema,
            "db",
            "kv",
            ckpt,
            upsert_keys=("k",),
            writer=coll.writer(),
        )
        assert q.awaitTermination(120)
        q.stop()

    feed([(1, 10), (2, 20)])
    run()
    feed([(1, 99), (3, 30)])
    run()

    state = {r.k: r.v for r in coll.df(spark).collect()}
    assert state == {1: 99, 2: 20, 3: 30}
    assert coll.batches >= 2


def test_write_options_upsert_shape():
    opts = write_options("db", "c", uri="mongodb://x", upsert_keys=("a", "b"))
    assert opts["operationType"] == "replace"
    assert opts["idFieldList"] == "a,b"
    assert opts["ordered"] == "false"
