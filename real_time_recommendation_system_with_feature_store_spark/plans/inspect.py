"""Plan-inspection helpers — the engine's feedback loop for scale work.

There is no custom planner (Catalyst is the planner, SURVEY.md §4); this
module just makes physical-plan assertions testable: tests assert that
filters reach the parquet scan, small dims broadcast, and hot paths stay in
WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def plan_checks(df: DataFrame) -> dict[str, bool]:
    """Quick booleans over the formatted physical plan."""
    plan = explain_str(df)
    return {
        "has_pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "has_broadcast_join": "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan,
        "has_wholestage_codegen": "WholeStageCodegen" in plan,
        "has_sort_merge_join": "SortMergeJoin" in plan,
        "has_exchange": "Exchange" in plan,
    }
