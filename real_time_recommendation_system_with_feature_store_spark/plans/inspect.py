"""Plan-inspection helpers — the engine's feedback loop for scale work.

There is no custom planner (Catalyst is the planner, SURVEY.md §4); this
module just makes physical-plan assertions testable: tests assert that
filters reach the parquet scan, small dims broadcast, and hot paths stay in
WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate (no job; file-source stats
    scaled by projection/filter). ``None`` when estimation fails — callers
    must treat unknown as too big. Caveat the gates below depend on: the
    estimate is SANE for scans/filters/projections/semi-joins (bounded by
    a child) but join/distinct cardinalities without column statistics
    blow up multiplicatively — gate on a bounding child, not on such a
    frame."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover - estimation is best-effort
        return None


# Forced-broadcast budget: well above autoBroadcastJoinThreshold (these are
# deliberate hints on frames Catalyst under-loves), well below executor
# memory at the design point. Estimates are pre-compression logical sizes,
# so this is conservative.
_FORCED_BROADCAST_LIMIT_BYTES = 256 << 20


def gated_broadcast(
    df: DataFrame,
    gate_df: DataFrame | None = None,
    limit_bytes: int = _FORCED_BROADCAST_LIMIT_BYTES,
) -> DataFrame:
    """A ``F.broadcast`` hint that only fires when the frame is actually
    small: returns the hinted frame when Catalyst's size estimate fits
    ``limit_bytes``, the UNhinted frame otherwise — the join then falls
    back to whatever shuffled strategy the planner picks, which is the
    correct answer for a data-dependent side that outgrew its expected
    bound (e.g. a hot-key skew inflating a pruned fact slice at 100x the
    tested scale; an ungated force would OOM the executors instead).

    ``gate_df``: optional frame whose estimate stands in for ``df``'s —
    pass a SUPERSET with a sane estimate when ``df`` itself ends in a
    join/distinct whose no-column-stats estimate is meaninglessly inflated
    (the plan_size_bytes caveat). Unknown estimates count as too big."""
    est = plan_size_bytes(gate_df if gate_df is not None else df)
    if est is not None and est <= limit_bytes:
        return F.broadcast(df)
    return df


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
