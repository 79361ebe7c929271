"""Physical-plan inspection utilities (SURVEY §4 — the scale guardrails).

The engine writes logical plans and lets Catalyst pick physical
strategies; these helpers make the *expected* physical properties
assertable in tests, so a regression that silently de-optimizes a plan
(lost filter pushdown, broadcast flipped to sort-merge, full sort where
a top-k heap should be) fails CI instead of shipping a 100 TB slowdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (post-Catalyst, pre-AQE-execution)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if every fragment appears in the scan's PushedFilters list."""
    plan = physical_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = " ".join(pushed)
    return bool(pushed) and all(f in joined for f in fragments)


def scan_read_schema(df: DataFrame) -> str:
    """The ReadSchema of the (first) parquet scan — column pruning proof."""
    for line in physical_plan(df).splitlines():
        if "ReadSchema" in line:
            return line.strip()
    return ""


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = fewer interpreter gaps)."""
    return physical_plan(df).count("WholeStageCodegen")
