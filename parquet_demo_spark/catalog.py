"""Fixture-table catalog: parquet scans with pushdown intact (SURVEY §2A R2/R3).

The reference reads whole files into memory (``io.py:78-80`` reads every
column of every row group). Here a "table" is a lazy
``spark.read.parquet`` scan: Catalyst prunes columns and pushes predicates
into the scan, so downstream queries only decode what they use — the
difference between "load 100 TB" and "scan the 2 columns you asked for".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as parquet timestamp[ns]: Spark reads them as BIGINT nanos
# (spark.sql.legacy.parquet.nanosAsLong) and we down-convert to µs timestamps
# here — the same truncation the reference applies in its unit switch
# (`src/parquet_demo/io.py:43-48`) and what DuckDB reports for these files.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one fixture table."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        if isinstance(df.schema[col].dataType, T.LongType):
            # integral `div`, NOT `/1000` — epoch-ns (~1.7e18) exceeds
            # double's 2^53 integer range, so float division is off by
            # ±1µs on ~12% of values
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL surface)."""
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load(spark, sf_dir, name).createOrReplaceTempView(name)
