"""Per-query profiling harness for the optimization rounds (guide §1).

For every query in bench.py's three sections this measures, on the bench's
own session/config:

* build   — seconds to construct the DataFrame (planning + any eager
            stats/persist jobs the query runs at build time)
* noop    — best-of-3 seconds for fn() + noop-sink write (computes EVERY
            column; guide §1.4 — isolates computation from the sink)
* count   — best-of-3 seconds for fn() + .count() (bench.py's timed action,
            kept for cross-round comparability)

and snapshots `.explain("formatted")` to plans/<round>/<name>_<tag>.txt.

Usage: python tools/profile_bench.py <tag> [out_json] [names...]
  tag       e.g. "before" / "after" — suffix for the plan files
  out_json  default /tmp/profile_<tag>.json
  names     optional subset; default = all benched queries
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from real_time_recommendation_system_with_feature_store_spark import get_spark
from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_ROUND", "r15"))


def bench_names() -> list[str]:
    import bench

    return list(bench.HEADLINE) + list(bench.IVM_SECTION) + list(bench.DRIFT_SECTION)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    out_json = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/profile_{tag}.json"
    names = sys.argv[3:] or bench_names()
    os.makedirs(PLAN_DIR, exist_ok=True)

    spark = get_spark("profile")
    spark.range(1000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    spark.range(64).repartition(32).mapInPandas(_ident, "id long").count()
    from real_time_recommendation_system_with_feature_store_spark.session import load_tables

    for df in load_tables(spark, SF_DIR, register=False).values():
        df.select(df.columns[0]).limit(1).collect()

    out: dict[str, dict] = {}
    for name in names:
        spec = QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        build = time.perf_counter() - t0
        jvm = spark.sparkContext._jvm
        with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(
                jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            )
        noop = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            d = spec.fn(spark, SF_DIR)
            d.write.format("noop").mode("overwrite").save()
            noop = min(noop, time.perf_counter() - t0)
        cnt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            d = spec.fn(spark, SF_DIR)
            d.count()
            cnt = min(cnt, time.perf_counter() - t0)
        out[name] = {
            "build": round(build, 3),
            "noop": round(noop, 3),
            "count": round(cnt, 3),
        }
        print(f"# {name}: build={build:.3f} noop={noop:.3f} count={cnt:.3f}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"tag": tag, "n": len(out), "out": out_json}))


if __name__ == "__main__":
    main()
