"""DuckDB oracle harness (SURVEY §5.2.2 — the differential correctness gate).

Runs a declared query's Spark plan and its ANSI-SQL oracle on the same
parquet fixtures and compares: row count, column names, and values
(order-insensitive — rows and columns are sorted canonically before
comparison, mirroring the driver's value-hash).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
from pyspark.sql import DataFrame

from parquet_demo_spark.catalog import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Run oracle SQL in DuckDB with fixture tables registered as views."""
    con = duckdb.connect()
    try:
        for name in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
                )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return cols, cur.fetchall()
    finally:
        con.close()


def _canon(v):
    """Canonicalize one value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _sortkey(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=_sortkey)
    return out


def compare(spark_df: DataFrame, oracle_sql: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result (raises AssertionError)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = run_oracle(oracle_sql, sf_dir)

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sc = canon_rows(s_cols, s_rows)
    dc = canon_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(sc, dc)):
        assert a == b, (
            f"value mismatch at canonical row {i}:\n  spark : {a}\n  duckdb: {b}"
        )
