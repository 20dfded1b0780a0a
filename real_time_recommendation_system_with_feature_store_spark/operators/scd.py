"""Slowly-changing-dimension (type 2) history from a change log.

The reference's online store keeps only the LATEST feature row per entity
(src/features/simple_feature_store.py:73-80); its point-in-time retrieval
(simple_feature_store.py:52-71) therefore needs the full history. This
operator builds that history table from an append-only change log — the
standard CDC shape a streaming feature pipeline lands — so point-in-time
(as-of) reads become interval lookups.

Scale: ONE shuffle on the entity key; `lead()` closes each version within
the partition. History rows are immutable after the close, so incremental
maintenance appends the new changes, re-closes only each key's previously
open row (a keyed join against the delta's min-ts per key), and never
rewrites closed history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.ident import qcol


def scd2_from_changelog(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: Sequence[str] = (),
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Each change row becomes a version valid [its ts, next change's ts).

    The final version per key stays open (``valid_to`` null). ``tiebreak``
    totalizes the order for same-timestamp changes (last one wins the open
    interval; earlier ones get zero-length intervals, preserved so the row
    count is deterministic).
    """
    order = [qcol(ts_col).asc()] + [qcol(t).asc() for t in tiebreak]
    w = Window.partitionBy(*[qcol(k) for k in keys]).orderBy(*order)
    return df.withColumn(valid_from, qcol(ts_col)).withColumn(
        valid_to, F.lead(qcol(ts_col)).over(w)
    )


def snapshot_at(
    history: DataFrame,
    at: Column,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """The dimension as of ``at``: rows whose interval covers the instant.

    Interval predicates are partition-prunable when the history is written
    partitioned/sorted by ``valid_from`` — a snapshot reads only segments
    that started at-or-before ``at``.
    """
    return history.where(
        (qcol(valid_from) <= at) & (qcol(valid_to).isNull() | (qcol(valid_to) > at))
    )


def scd2_apply_increment(
    history: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: Sequence[str] = (),
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Fold a new changelog batch into an existing SCD2 history.

    Closed rows pass through UNTOUCHED (at 100 TB they are the bulk of the
    table and never re-shuffle — only each key's single open row joins the
    delta); open rows of keys present in the delta close at the delta's
    first change; the delta itself becomes versions via the same lead()
    construction. Assumes in-order arrival (every delta ts >= the key's open
    ``valid_from``), the same contract as the reference's online upsert
    (simple_feature_store.py:73-80).
    """
    closed = history.where(qcol(valid_to).isNotNull())
    open_rows = history.where(qcol(valid_to).isNull())
    first_change = delta.groupBy(*[qcol(k) for k in keys]).agg(
        F.min(qcol(ts_col)).alias("__new_from")
    )
    # No broadcast hint: first_change is one row per delta key, but a large
    # backfill delta would blow the broadcast/driver limit — AQE promotes to
    # broadcast when the aggregated delta is actually small.
    reclosed = (
        open_rows.join(first_change, list(keys), "left")
        .withColumn(valid_to, F.coalesce(F.col("__new_from"), qcol(valid_to)))
        .drop("__new_from")
    )
    delta_hist = scd2_from_changelog(
        delta, keys, ts_col, tiebreak=tiebreak, valid_from=valid_from, valid_to=valid_to
    )
    return closed.unionByName(reclosed).unionByName(delta_hist)
