"""Sessionization — SURVEY.md §2.9 ST7 (batch analog).

Gap-based sessions via lag + running sum of boundary flags: one shuffle on
the entity key, no UDF. The streaming twin is ``session_window(ts, gap)``
in streaming/pipeline.py; this batch form is the oracle-checkable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int = 1800,
    session_col: str = "session_id",
    tiebreak: str | None = None,
) -> DataFrame:
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(F.col(ts)).over(w)
    is_new = (
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts)) - F.unix_timestamp(prev_ts)) > F.lit(gap_seconds))
    ).cast("int")
    running = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(session_col, running)
