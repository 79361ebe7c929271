"""File-format sources & sinks beyond parquet.

The reference is parquet-only (`src/parquet_demo/io.py`); Spark's
reader/writer surface gives CSV, JSON and ORC for free. These wrappers
pin the engine's semantics (explicit schemas — NEVER inferSchema in a
pipeline; UTC timestamps; null round-tripping) so every format behaves
like the parquet path.

Format guidance encoded here:
- parquet/ORC: columnar, compressed, predicate pushdown → data at rest.
- CSV/JSON: interchange only — row-oriented, no pushdown, no types
  (CSV) — always paired with an explicit schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CSV_OPTIONS = {
    "header": "true",
    "nullValue": r"\N",  # the canonical null token (FIXTURES.md)
    "timestampFormat": "yyyy-MM-dd HH:mm:ss[.SSSSSS]",
    "escape": '"',
}


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(**CSV_OPTIONS).csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """Explicit schema required: CSV has no types, and inferSchema is a
    full extra pass over the data (never acceptable at 100 TB)."""
    return spark.read.options(**CSV_OPTIONS).schema(schema).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
