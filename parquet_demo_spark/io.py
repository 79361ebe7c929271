"""Columnar table I/O (SURVEY §2A R1/R2/R9, build plan steps 1–2).

The reference's library surface is exactly two functions plus schema
inference (`src/parquet_demo/io.py:7-80`, `examples/run_example.py:78-106`).
Re-expressed on Spark:

- ``write_table(spark, path, schema, rows)`` — row-dict ingest edge.
  The reference pivots dicts into per-field lists and hand-coerces each
  value (`io.py:16-66`, 46 LoC of coercion); here
  ``spark.createDataFrame`` + Catalyst casts do the same coercions, and
  the µs-double-count bug at ``io.py:42`` cannot exist (native
  timestamp handling).
- ``read_table(spark, path)`` — full-scan equivalent of ``io.py:78-80``,
  but lazy: Catalyst prunes columns/predicates per downstream query
  instead of materializing every column.
- ``infer_schema_from_rows(rows)`` — preserves the reference's mapping
  (int→int64, float→float64, datetime→timestamp[µs] naive, date→date32,
  else→string; `run_example.py:93-104` including the isinstance order:
  int before float, datetime before date). Improvement kept deliberate
  and documented: ALL rows are inspected (first non-null wins per
  field), not just the first document (`run_example.py:86` first-doc
  limitation), so later-appearing fields/None-first fields infer
  correctly.

Coercion semantics preserved (SURVEY §1.2): naive datetimes are UTC
(session TZ pinned in session.py), None passes through as null, µs
timestamp precision on write (outputTimestampType=TIMESTAMP_MICROS).
"""

from __future__ import annotations

from collections.abc import Iterable
from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def infer_schema_from_rows(rows: Iterable[dict]) -> T.StructType:
    """Reference type mapping (`run_example.py:93-104`), all-rows scan."""
    fields: dict[str, T.DataType] = {}
    order: list[str] = []
    for row in rows:
        for key, value in row.items():
            if key not in order:
                order.append(key)
            if key not in fields and value is not None:
                fields[key] = _python_type_to_spark(value)
    return T.StructType(
        [
            T.StructField(name, fields.get(name, T.StringType()), True)
            for name in order
        ]
    )


def _python_type_to_spark(value) -> T.DataType:
    # isinstance order matters: bool ⊂ int, datetime ⊂ date
    # (run_example.py:93-102 checks int before float, datetime before date)
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, Decimal):
        return T.DecimalType(38, 10)
    if isinstance(value, datetime):
        # naive-µs timestamp; naive == UTC per SURVEY §1.2.1
        return T.TimestampNTZType() if value.tzinfo is None else T.TimestampType()
    if isinstance(value, date):
        return T.DateType()
    if isinstance(value, (bytes, bytearray)):
        return T.BinaryType()
    return T.StringType()


def write_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None,
    rows: Iterable[dict],
    rows_per_file: int | None = None,
) -> None:
    """R1: row dicts → typed columnar parquet (one call, distributed)."""
    rows = list(rows)
    if schema is None:
        schema = infer_schema_from_rows(rows)
    df = spark.createDataFrame(rows, schema)
    writer = df.write.mode("overwrite")
    if rows_per_file:
        writer = writer.option("maxRecordsPerFile", rows_per_file)
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """R2: lazy parquet scan (column-pruned, predicate-pushed)."""
    return spark.read.parquet(path)


def read_table_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read (SURVEY §1.3's documented free improvement).

    ``mergeSchema`` unions the footer schemas of every generation:
    columns added in later generations come back null for older files,
    dropped columns come back null for newer ones. Same-named columns
    must have IDENTICAL types — Spark does not widen (int32 vs int64
    errors); a re-typed column needs an explicit unified schema
    (``spark.read.schema(...)``, which does apply safe upcasts). The
    reference reads a single static footer
    (`src/parquet_demo/io.py:78-80`) and has no evolution story.

    Scale note: schema merging reads every file's FOOTER, not its data —
    cheap relative to a scan, but on a 100 TB table prefer declaring the
    unified schema explicitly (``spark.read.schema(s).parquet(...)``)
    and keep mergeSchema for exploratory reads.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    rows_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet layout — the reference's own "next
    improvement" (its README lists partitioned writes as future work;
    it writes single flat files only).

    At 100 TB this is the difference between scanning everything and
    partition pruning: a filter on a partition column skips whole
    directories before any I/O happens. Typical key: a low-cardinality
    derived date (`F.to_date(ts)`) or tenant/source column.
    """
    writer = df.write.mode(mode).partitionBy(*partition_cols)
    if rows_per_file:
        writer = writer.option("maxRecordsPerFile", rows_per_file)
    writer.parquet(path)
