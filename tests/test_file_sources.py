"""CSV/JSON/ORC round-trips with explicit schemas: every format must
preserve the same values the parquet path does (nulls included)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.sources import files

SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
)


@pytest.fixture(scope="module")
def orders_sample(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .limit(200)
        # a null per column exercises the \N token round-trip
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 50 == 0, None).otherwise(
                F.col("o_orderstatus")
            ),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip(spark, orders_sample, tmp_path):
    p = str(tmp_path / "o_csv")
    files.write_csv(orders_sample, p)
    back = files.read_csv(spark, p, SCHEMA)
    assert _rows(back) == _rows(orders_sample)


def test_json_roundtrip(spark, orders_sample, tmp_path):
    p = str(tmp_path / "o_json")
    files.write_json(orders_sample, p)
    back = files.read_json(spark, p, SCHEMA)
    assert _rows(back) == _rows(orders_sample)


def test_orc_roundtrip(spark, orders_sample, tmp_path):
    p = str(tmp_path / "o_orc")
    files.write_orc(orders_sample, p)
    back = files.read_orc(spark, p)
    assert _rows(back) == _rows(orders_sample)
