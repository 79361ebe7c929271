"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (S10, TPC-H Q1-shaped pricing
summary) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the full
declared surface from SURVEY.md §2B via the engine's query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    """Pin the session semantics the engine needs (session.py §4.2)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from parquet_demo_spark.registry import all_queries

    _configure(spark)
    return all_queries()["q10_agg_pricing_summary"].spark(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from parquet_demo_spark.registry import all_queries

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in all_queries().items():
        def run(spark: SparkSession, sf_dir: str, _q=q) -> DataFrame:
            _configure(spark)
            return _q.spark(spark, sf_dir)

        out[name] = run
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    from parquet_demo_spark.registry import all_queries

    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle
    }
