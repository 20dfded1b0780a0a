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


def plan_checks(df: DataFrame, execute: bool = False) -> dict[str, bool]:
    """Quick booleans over the physical plan.

    Under AQE the pre-execution plan is an unresolved AdaptiveSparkPlan with
    no codegen spans; pass ``execute=True`` to run the plan first and inspect
    the FINAL adaptive plan (``*(n)`` markers in simple mode).
    """
    if execute:
        # collect() (not count()) so THIS df's plan finalizes under AQE —
        # count() builds a different query whose execution leaves this one
        # unresolved. Inspection-time tool: only call on test-sized frames.
        df.collect()
    plan = explain_str(df)
    simple = explain_str(df, "simple")
    return {
        "has_pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "has_broadcast_join": "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan,
        "has_wholestage_codegen": "*(" in simple,
        "has_sort_merge_join": "SortMergeJoin" in plan,
        "has_exchange": "Exchange" in plan,
        "is_final_plan": "isFinalPlan=true" in simple or "AdaptiveSparkPlan" not in simple,
    }
