"""Driver-window rotation guard (r9 VERDICT "Next round" #2).

Two of the first four rotation directives were dropped (r6, r9), leaving
entries with stale or zero driver-oracle evidence.  This test makes a
non-rotation impossible to commit: it rebuilds the evidence ledger from
the CORRECTNESS_r*.json artifacts the driver itself writes, and fails
whenever ``_DRIVER_WINDOW`` does not front the stalest / never-checked
catalog entries.

Invariant (ties handled): with ``round(e)`` = newest round in which entry
``e`` was driver-green (0 if never checked), and ``cutoff`` = the 50th
smallest round value over the whole catalog,

* every entry with ``round(e) < cutoff`` MUST be in the window (this
  forces never-checked/new entries and the stalest tier to the front);
* no entry with ``round(e) > cutoff`` may occupy a slot (no fresh entry
  may squat while a staler one waits);
* entries at exactly ``cutoff`` fill the remaining slots in any order.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green(res: dict) -> bool:
    """The driver's pass condition: rows+schema match, hash not refuted.

    Weaker rows-only checks (no oracle_sql) report hash_match=None; those
    still count as driver evidence for staleness purposes.
    """
    return bool(
        isinstance(res, dict)
        and res.get("rows_match")
        and res.get("schema_match")
        and res.get("hash_match") is not False
        and res.get("err") is None
    )


def _ledger(before_round: int | None = None) -> dict[str, int]:
    newest: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        if before_round is not None and rnd >= before_round:
            continue
        with open(path) as fh:
            data = json.load(fh)
        if not isinstance(data, dict):
            continue
        for name, res in data.items():
            if _green(res):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def test_driver_window_fronts_stalest_entries():
    from real_time_recommendation_system_with_feature_store_spark.queries import (
        QUERIES,
        _DRIVER_WINDOW,
        _DRIVER_WINDOW_ROUND,
    )

    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50

    # The window is valid FOR its declared round: it must front whatever
    # was stalest / never-checked given the evidence from rounds before
    # it. Once an artifact from _DRIVER_WINDOW_ROUND itself lands (the
    # round was served), the window is allowed to stand until the NEXT
    # round's artifact appears — at which point an un-bumped, un-rotated
    # window fails here, in the verdict's own suite run.
    max_present = max(_ledger().values(), default=0)
    assert _DRIVER_WINDOW_ROUND in (max_present, max_present + 1), (
        f"_DRIVER_WINDOW targets round {_DRIVER_WINDOW_ROUND} but driver "
        f"evidence through round {max_present} is already committed — "
        "rotate the window for the new round and bump _DRIVER_WINDOW_ROUND"
    )

    newest = _ledger(before_round=_DRIVER_WINDOW_ROUND)
    rounds = {name: newest.get(name, 0) for name in QUERIES}
    cutoff = sorted(rounds.values())[49]
    window = set(_DRIVER_WINDOW)

    must_front = sorted(n for n, r in rounds.items() if r < cutoff)
    missing = [n for n in must_front if n not in window]
    assert not missing, (
        f"stale/never-checked entries (newest-green < r{cutoff}) left out of "
        f"_DRIVER_WINDOW — rotate it: {missing}"
    )

    squatters = sorted(
        (n, rounds[n]) for n in window if rounds[n] > cutoff
    )
    assert not squatters, (
        f"entries with fresh driver evidence (> r{cutoff}) are squatting in "
        f"_DRIVER_WINDOW while staler entries wait: {squatters}"
    )


def test_ledger_sees_driver_artifacts():
    # Guard the guard: if the artifact glob breaks (rename, move), the
    # rotation test would pass vacuously with cutoff 0.
    newest = _ledger()
    assert len(newest) >= 100, f"ledger only saw {len(newest)} entries"
    assert max(newest.values()) >= 9
