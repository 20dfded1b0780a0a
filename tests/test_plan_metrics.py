"""Plan-shape regression gate: live static-plan metrics for every catalog
query must match the committed PLAN_METRICS.json snapshot.

Wall-clock on this host swings 10-20% run-to-run for identical code; plan
shape doesn't. A failure here means a change added/removed a shuffle,
swapped a join strategy, or moved work into/out of Python — if intentional,
regenerate with `python tests/plan_metrics.py` and explain the diff in the
commit message."""

from __future__ import annotations

import json
import os

from tests.plan_metrics import collect_all

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_plan_metrics_match_snapshot(spark):
    with open(os.path.join(REPO, "PLAN_METRICS.json")) as f:
        snap = json.load(f)["queries"]
    live = collect_all(spark, SF_DIR)
    diffs = []
    for name in sorted(set(snap) | set(live)):
        if snap.get(name) != live.get(name):
            diffs.append(
                f"{name}:\n  snapshot: {snap.get(name)}\n  live:     {live.get(name)}"
            )
    assert not diffs, (
        f"{len(diffs)} quer{'y' if len(diffs)==1 else 'ies'} changed plan shape "
        "(regenerate tests/plan_metrics.py if intentional):\n" + "\n".join(diffs)
    )
