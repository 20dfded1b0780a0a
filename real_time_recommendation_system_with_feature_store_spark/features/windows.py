"""Multi-time-window aggregation — SURVEY.md §2.5 W4 / §2.3 J3, fused.

The reference computes 1h/24h/7d features as THREE separate scans outer-joined
then zero-filled (src/features/feature_engineering.py:238-267,304-309). Here
all windows come out of ONE scan with conditional aggregation — identical
results (outer-join-of-per-window-groupbys ≡ single groupby over the union of
keys, with fill_null(0) ≡ the unmatched-window zero counts), ~3× less IO and
two fewer shuffles. This is the design point called out in SURVEY.md §4.2.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.ident import qcol


def window_flag(ts: Column, anchor: Column, seconds: int) -> Column:
    """True when ts falls in (anchor - seconds, anchor].

    Full-precision timestamp comparison (NOT unix_timestamp, which truncates
    to seconds and silently shifts sub-second boundary events).
    """
    return (ts <= anchor) & (ts > anchor - F.expr(f"INTERVAL {seconds} SECOND"))


def multi_window_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    anchor: datetime | Column,
    windows: dict[str, int],
    measures: dict[str, Column],
) -> DataFrame:
    """One-scan conditional aggregation over multiple lookback windows.

    ``windows`` maps suffix -> lookback seconds (e.g. {"1h": 3600}).
    ``measures`` maps name -> a function-free aggregate Column BUILDER applied
    per window: each value must be a callable taking the window-flag Column
    and returning an aggregate Column (so the measure can gate on the flag).

    Output columns: ``{measure}_{suffix}`` for every (measure, window).
    """
    anchor_col = F.lit(anchor) if isinstance(anchor, datetime) else anchor
    aggs = []
    for suffix, seconds in windows.items():
        flag = window_flag(qcol(ts_col), anchor_col, seconds)
        for name, builder in measures.items():
            aggs.append(builder(flag).alias(f"{name}_{suffix}"))
    return df.groupBy(*[qcol(k) for k in keys]).agg(*aggs)


# Standard measure builders (A2/A3/A4/A5 shapes, reference
# feature_engineering.py:201-207)
def count_where(pred: Column):
    """A2: conditional count, e.g. clicks in window."""
    return lambda flag: F.sum(F.when(flag & pred, 1).otherwise(0))


def count_in_window():
    """A3: plain event count in window."""
    return lambda flag: F.sum(F.when(flag, 1).otherwise(0))


def avg_in_window(col: Column):
    """A4: mean of a measure inside the window (null when empty)."""
    return lambda flag: F.avg(F.when(flag, col))


def sum_in_window(col: Column):
    return lambda flag: F.sum(F.when(flag, col))


def distinct_in_window(col: Column):
    """A5: exact distinct inside window. At 100 TB prefer
    approx_count_distinct — exact distinct per window multiplies state."""
    return lambda flag: F.count_distinct(F.when(flag, col))
