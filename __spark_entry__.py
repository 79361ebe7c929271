"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (S10, TPC-H Q1-shaped pricing
summary) on sf0.001. ``queries()`` / ``oracle_sql()`` expose the full
declared surface from SURVEY.md §2B via the engine's query registry.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)


# Green rows recorded before this round are stale for these queries: their
# latest driver rows (r02/r03) predate the round-4 fixture regeneration that
# changed the events timestamp physical type. Forcing a minimum round makes
# the driver re-verify them on the current fixtures; once a row from a round
# >= the floor lands, they settle again with no further maintenance.
_MIN_SETTLED_ROUND: dict[str, int] = {
    "q60_stream_tumbling": 6,
    "q61_stream_sliding": 6,
    "q62_stream_session": 6,
    "q63_stateful_user_profile": 6,
    "q77_stream_append_filesink": 6,
    "q86_stream_stream_join": 6,
    "q87_stream_dedup": 6,
    "q105_stream_static_join": 6,
}


def _fixtures_mtime() -> float:
    """Newest mtime across the driver-generated parquet fixtures."""
    newest = 0.0
    for path in glob.glob("/root/testdata/sf*/*.parquet"):
        try:
            newest = max(newest, os.path.getmtime(path))
        except OSError:
            continue
    return newest


def _settled_names(has_oracle: dict[str, bool] | None = None) -> set[str]:
    """Queries whose LATEST driver row is conclusive.

    Rounds are scanned in order and the newest row per query wins, so a
    query that was green in r01 but regressed to ERR later is unsettled
    again and returns to the front of the queue. A row is conclusive
    when all three matches are green, or when the driver recorded
    ``no_oracle`` AND the registry still declares no oracle for that
    query (once an oracle is added, the stale rows-only row no longer
    settles it). Queries with no row yet — or an ERR row — are
    unsettled and must be presented to the driver first: the driver
    samples a prefix of ``queries()`` per round, so ordering is how the
    full registry accumulates coverage across rounds.

    Two staleness guards on top of the green/no-oracle rule:

    - A row recorded before the fixtures' newest mtime is unsettled even
      if green: the environment persists across rounds, so a fixture
      regeneration leaves older CORRECTNESS files with older mtimes and
      every row in them verified against data that no longer exists.
    - ``_MIN_SETTLED_ROUND`` pins queries whose staleness predates the
      current checkout (mtimes reset on clone, hiding it from the rule
      above) until a row from a sufficiently new round re-greens them.
    """
    latest: dict[str, dict] = {}
    latest_round: dict[str, int] = {}
    latest_mtime: dict[str, float] = {}

    def _round_no(path: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        return int(m.group(1)) if m else -1

    # numeric order: lexicographic glob order would sort r100 before
    # r11..r99 and let stale rows overwrite the newest verdicts
    for path in sorted(
        glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")), key=_round_no
    ):
        try:
            rows = json.load(open(path))
            mtime = os.path.getmtime(path)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict):
                latest[name] = row
                latest_round[name] = _round_no(path)
                latest_mtime[name] = mtime
    fixtures_mtime = _fixtures_mtime()
    settled: set[str] = set()
    for name, row in latest.items():
        if latest_round.get(name, -1) < _MIN_SETTLED_ROUND.get(name, -1):
            continue
        if latest_mtime.get(name, 0.0) < fixtures_mtime:
            continue
        if row.get("err") == "no_oracle":
            if not (has_oracle or {}).get(name, False):
                settled.add(name)
        elif (
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
        ):
            settled.add(name)
    return settled


def _driver_ordered(names, has_oracle: dict[str, bool] | None = None) -> list[str]:
    """Unsettled queries first (stable order), settled ones after."""
    settled = _settled_names(has_oracle)
    names = list(names)
    return [n for n in names if n not in settled] + [
        n for n in names if n in settled
    ]


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

    registry = all_queries()
    has_oracle = {name: q.oracle is not None for name, q in registry.items()}
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _driver_ordered(registry, has_oracle):
        def run(spark: SparkSession, sf_dir: str, _q=registry[name]) -> DataFrame:
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
