"""Deterministic plan-shape metrics for every catalog query.

Wall-clock benchmarks on this host are noisy (±1-3s run-to-run for identical
code), so plan SHAPE is the regression signal that actually holds: exchange
(shuffle) counts, scan counts, join strategies, and Python-stage counts from
the STATIC physical plan (pre-AQE, deterministic for fixed test data + conf).
A future change that silently adds a shuffle, drops a broadcast, or demotes
a TakeOrderedAndProject changes these numbers even when the wall-clock noise
hides it.

Run directly to (re)generate the committed snapshot:

    python tests/plan_metrics.py [sf_dir] [out_json]

`tests/test_plan_metrics.py` compares the live metrics against
`PLAN_METRICS.json` and fails with a per-query diff; regenerate ONLY when
the plan change is intentional, and say why in the commit message.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_COUNTERS = {
    "exchanges": "Exchange ",
    "scans": "FileScan parquet",
    "cartesian": "CartesianProduct",
    "bnl_joins": "BroadcastNestedLoopJoin",
    "smj_joins": "SortMergeJoin",
    "bh_joins": "BroadcastHashJoin",
    "take_ordered": "TakeOrderedAndProject",
    "window_group_limits": "WindowGroupLimit",
    "python_row_udf": "BatchEvalPython",
    "arrow_stages": "MapInPandas",
}


def metrics_for(df) -> dict:
    # executedPlan (NOT sparkPlan): EnsureRequirements has inserted the
    # Exchanges by this phase, so requirement-driven shuffles count — the
    # whole point of the gate. Pre-execution this is still the static
    # initial plan (AdaptiveSparkPlan isFinalPlan=false), deterministic for
    # fixed data + conf.
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {k: plan.count(v) for k, v in _COUNTERS.items()}


def collect_all(spark, sf_dir: str) -> dict:
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    out = {}
    for name, spec in QUERIES.items():
        try:
            out[name] = metrics_for(spec.fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - surfaced in the test diff
            out[name] = {"error": repr(e)[:200]}
    return dict(sorted(out.items()))


def main() -> int:
    from real_time_recommendation_system_with_feature_store_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_METRICS.json"
    )
    spark = get_spark("plan-metrics", shuffle_partitions=8)
    data = {"sf_dir": sf_dir, "queries": collect_all(spark, sf_dir)}
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    n_err = sum(1 for v in data["queries"].values() if "error" in v)
    print(f"wrote {out_path}: {len(data['queries'])} queries, {n_err} errors")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
