"""Run every catalog query under a BARE SparkSession — the driver's world.

The round driver does NOT use ``get_spark()``: it builds a plain
``SparkSession.builder.master(...).getOrCreate()`` with none of the repo's
session conf — in particular **no Arrow** (`spark.sql.execution.arrow.pyspark.
enabled` unset). Round 2's only crash (`ivf_ann_topk`) was an Arrow-dependent
``createDataFrame(pandas)`` that only ever ran under the repo session. This
sweep is the regression gate: every ``QUERIES`` entry must build AND execute
under the bare session.

Run directly (``python tests/bare_session_sweep.py [sf_dir]``) or via
``tests/test_bare_session.py`` (subprocess — a bare session can't coexist
with the tuned session fixture in one JVM, since getOrCreate would reuse it).

Conf kept deliberately minimal: nanosAsLong (required to scan the driver's
events.parquet, conditional in ``_t`` so sessions without it also work), UTC
timezone (value parity, not crash-proofing), and small shuffle partitions
(speed only — irrelevant to the Arrow failure mode being regression-tested).
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("bare-session-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    assert (
        spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "false") == "false"
    ), "sweep must run WITHOUT Arrow to mirror the driver"
    spark.sparkContext.setLogLevel("ERROR")

    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    failures: dict[str, str] = {}
    for name, spec in QUERIES.items():
        try:
            rows = spec.fn(spark, sf_dir).collect()
            print(f"ok {name}: {len(rows)} rows", flush=True)
        except Exception:
            failures[name] = traceback.format_exc()
            print(f"FAIL {name}", flush=True)
    for name, tb in failures.items():
        print(f"\n=== {name} ===\n{tb}", file=sys.stderr, flush=True)
    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} ok", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    raise SystemExit(main(sf))
