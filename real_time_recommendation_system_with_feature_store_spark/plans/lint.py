"""Plan linter — pre-flight scale audit for any DataFrame.

The plan-shape rules tests/test_plans.py enforces on the catalog, packaged
as an API a production pipeline can run BEFORE submitting a 100 TB job:
``lint_plan(df)`` returns findings, ``assert_scalable(df)`` raises on the
patterns that are always bugs at scale. Inspection is driver-side string
analysis of the physical plan — no job runs.

Rules (each finding carries the rule id):
  cartesian-product     CartesianProduct — an un-keyed, un-broadcast join;
                        quadratic work at any scale.
  single-partition-window  a Window consuming an Exchange SinglePartition —
                        the whole input funnels through ONE task (the
                        operators/rank.py trap; use global_row_number /
                        global_exclusive_prefix_sum).
  single-partition-sort  a global Sort fed by Exchange SinglePartition that
                        is not a TakeOrderedAndProject — one-task sort.
  python-row-udf        BatchEvalPython — row-at-a-time Python UDF in the
                        plan (~10-100x slower than Arrow; use pandas_udf /
                        mapInPandas).
  unpushed-filter       a parquet scan with DataFilters but empty
                        PushedFilters — predicate stopped above the scan.

``allow`` suppresses rule ids for intentional shapes (e.g. a deliberate
1-row cross join compiles to BroadcastNestedLoopJoin and is NOT flagged;
a deliberate tiny single-partition aggregate is fine and also not flagged —
only a *Window/Sort* directly over a SinglePartition exchange is).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def lint_plan(df: DataFrame, allow: set[str] | frozenset[str] = frozenset()) -> list[dict]:
    """Audit ``df``'s physical plan; returns [{rule, detail}, ...]."""
    plan = _physical_plan(df)
    findings: list[dict] = []

    def add(rule: str, detail: str) -> None:
        if rule not in allow:
            findings.append({"rule": rule, "detail": detail})

    if "CartesianProduct" in plan:
        add("cartesian-product", "CartesianProduct in plan")

    # window/sort directly downstream of a SinglePartition exchange: walk
    # indented tree lines; a Window/Sort node whose subtree (deeper indent)
    # begins with Exchange SinglePartition is the one-task funnel
    lines = plan.splitlines()

    def indent(s: str) -> int:
        return len(s) - len(s.lstrip(" :+-"))

    consumed_sorts: set[int] = set()
    for i, line in enumerate(lines):
        node = line.lstrip(" :+-*(0123456789)")
        is_window = node.startswith("Window ") or node.startswith("WindowExec")
        is_sort = node.startswith("Sort ") and i not in consumed_sorts
        if not (is_window or is_sort):
            continue
        base = indent(line)
        for k in range(i + 1, len(lines)):
            nxt = lines[k]
            if not nxt.strip():
                continue
            if indent(nxt) <= base:
                break
            child = nxt.lstrip(" :+-*(0123456789)")
            if child.startswith("Sort "):
                # a Window's required sort is part of the same funnel —
                # look through it (and don't re-flag it standalone)
                if is_window:
                    consumed_sorts.add(k)
                    continue
                break
            if child.startswith("Exchange SinglePartition"):
                add(
                    "single-partition-window" if is_window else "single-partition-sort",
                    line.strip()[:160],
                )
            break  # first non-Sort descendant decides

    if "BatchEvalPython" in plan:
        add("python-row-udf", "BatchEvalPython (row-at-a-time Python UDF)")

    for m in re.finditer(r"FileScan parquet [^\n]*", plan):
        s = m.group(0)
        if "PushedFilters: []" in s and re.search(r"DataFilters: \[[^\]]+\]", s):
            add("unpushed-filter", s[:160])

    return findings


def assert_scalable(df: DataFrame, allow: set[str] | frozenset[str] = frozenset()) -> None:
    """Raise ValueError listing every lint finding; no-op on a clean plan."""
    findings = lint_plan(df, allow=allow)
    if findings:
        msg = "; ".join(f"{f['rule']}: {f['detail']}" for f in findings)
        raise ValueError(f"plan fails scale lint ({len(findings)} finding(s)): {msg}")
