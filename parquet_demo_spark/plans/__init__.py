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


def _top_level_bracket_groups(s: str) -> int:
    """Count top-level ``[...]`` groups in a plan Arguments line."""
    depth = 0
    groups = 0
    for ch in s:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
    return groups


def single_task_window_count(df: DataFrame) -> int:
    """Number of Window operators with an EMPTY partition spec — the
    all-rows-through-one-task shape that is fine on a laptop and wrong
    at 100 TB. A partitioned Window's Arguments render three top-level
    bracket groups ``[functions], [partitionSpec], [orderSpec]``; an
    unpartitioned one only two. Queries that legitimately keep a
    bounded-input global window (e.g. ranking a top-1000 cut) assert
    ``== 1`` explicitly; everything else asserts ``== 0``."""
    plan = physical_plan(df)
    lines = plan.splitlines()
    n = 0
    for i, ln in enumerate(lines):
        stripped = ln.strip()
        if stripped.endswith(" Window") or stripped.endswith(" WindowExec"):
            for nxt in lines[i + 1 : i + 6]:
                if nxt.strip().startswith("Arguments:"):
                    if _top_level_bracket_groups(nxt) <= 2:
                        n += 1
                    break
    return n
