"""Driver-environment regression gate (VERDICT r2 items 1-2).

The round driver evaluates the catalog under a plain SparkSession with none
of get_spark()'s conf — crucially no Arrow, so driver-side
``createDataFrame(pandas-with-numpy-objects)`` falls back to
``_inferSchemaFromList`` and dies (r2's ``ivf_ann_topk`` crash). The sweep
runs in a subprocess because a bare session can't coexist with the tuned
session fixture in this JVM (getOrCreate would return the tuned one).
"""

from __future__ import annotations

import pytest

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.heavy
def test_every_query_runs_under_bare_session():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "bare_session_sweep.py"),
         os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"bare-session failures:\n{proc.stderr[-8000:]}"
