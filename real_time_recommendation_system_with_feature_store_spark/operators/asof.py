"""As-of (point-in-time) join — SURVEY.md §2.3 J7 / §2.1 S8.

Spark has no native as-of join; this composes one from an equi+range join and
a per-(entity, event) window dedup. Semantics match the reference feature
store's point-in-time retrieval (src/features/simple_feature_store.py:52-71):
for each left row, the latest right row with

    right.ts <= left.ts   AND   left.ts - right.ts <= ttl

ties broken by a caller-supplied secondary key (the reference uses
``created_timestamp``, src/features/feature_definitions.py:42).

Scale: the equi-key join shuffles both sides by entity; the TTL predicate is
pushed into the join condition, so candidates are bounded by the TTL horizon
instead of the whole history. Skewed entities are handled by AQE skew-join
(enabled in session.py). For a sorted-bucketed layout, swap the join for a
merge-join by writing both sides bucketed on the entity key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    ttl_seconds: float | None = None,
    tiebreak: Sequence[str] = (),
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the latest right row at-or-before left_ts.

    ``how='left'`` keeps cold entities (all right columns null), matching the
    reference's null rows for unseen entities.
    """
    right_cols = [c for c in right.columns if c not in on]
    r = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in on],
        *[F.col(c).alias(c) for c in right_cols],
    )

    cond = F.lit(True)
    for key in on:
        cond = cond & (left[key] == r[f"__r_{key}"])
    cond = cond & (r[right_ts] <= left[left_ts])
    if ttl_seconds is not None:
        # microsecond-exact TTL (unix_timestamp would truncate to seconds)
        cond = cond & (
            F.unix_micros(left[left_ts]) - F.unix_micros(r[right_ts])
            <= F.lit(int(ttl_seconds * 1_000_000))
        )

    joined = left.join(r, cond, how)

    # latest-per-left-row: order candidates by right_ts desc (+ tiebreaks)
    order = [F.col(right_ts).desc_nulls_last()] + [F.col(t).desc_nulls_last() for t in tiebreak]
    w = Window.partitionBy(*[left[c] for c in left.columns]).orderBy(*order)
    # Partitioning by every left column is correct but wasteful when the left
    # side has a unique key; callers with a row id should dedup on it instead.
    out = joined.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    return out.drop(*[f"__r_{k}" for k in on])


def asof_join_by_rowid(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    row_id: str,
    ttl_seconds: float | None = None,
    tiebreak: Sequence[str] = (),
    how: str = "left",
) -> DataFrame:
    """As-of join when the left side has a unique ``row_id`` — the scalable
    variant: window partitions by one key instead of all left columns."""
    right_cols = [c for c in right.columns if c not in on]
    r = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in on],
        *[F.col(c).alias(c) for c in right_cols],
    )
    cond = F.lit(True)
    for key in on:
        cond = cond & (left[key] == r[f"__r_{key}"])
    cond = cond & (r[right_ts] <= left[left_ts])
    if ttl_seconds is not None:
        # microsecond-exact TTL (unix_timestamp would truncate to seconds)
        cond = cond & (
            F.unix_micros(left[left_ts]) - F.unix_micros(r[right_ts])
            <= F.lit(int(ttl_seconds * 1_000_000))
        )
    joined = left.join(r, cond, how)
    order = [F.col(right_ts).desc_nulls_last()] + [F.col(t).desc_nulls_last() for t in tiebreak]
    w = Window.partitionBy(left[row_id]).orderBy(*order)
    out = joined.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    return out.drop(*[f"__r_{k}" for k in on])


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    ttl_seconds: float | None = None,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Merge-style as-of join: union both sides, ONE shuffle per entity key,
    and carry the latest right row forward with ``last(..., ignorenulls)``.

    Same semantics as ``asof_join(how="left")`` — for each left row, the
    right row with the greatest ``right_ts <= left_ts`` (ties broken by the
    greatest ``tiebreak``), nulls for cold entities, TTL nulling rows older
    than the horizon.

    This is the 100 TB path: the equi+range formulation materializes every
    (left row × in-horizon right row) candidate before the window dedup —
    with a 24 h TTL over busy entities that's a quadratic-ish blowup, and a
    single hot entity skews the range join. Here the cost is one hash
    shuffle of |left|+|right| rows and a per-partition sort; no candidate
    ever exists. (Per-partition running state, the Structured Streaming
    analog of which is exactly how the online store maintains "latest row
    per key".)
    """
    from pyspark.sql import Window

    l_payload = [c for c in left.columns]
    r_payload = [c for c in right.columns if c not in on]

    lt = left.select(
        *[F.col(k).alias(f"__k_{k}") for k in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c).alias(f"__l_{c}") for c in l_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in r_payload],
        *[F.lit(None).cast(right.schema[t].dataType).alias(f"__tb_{t}") for t in tiebreak],
    )
    rt = right.select(
        *[F.col(k).alias(f"__k_{k}") for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in l_payload],
        *[F.col(c).alias(f"__r_{c}") for c in r_payload],
        *[F.col(t).alias(f"__tb_{t}") for t in tiebreak],
    )
    u = lt.unionByName(rt)

    # Order: ts, then right-before-left at equal ts (right_ts <= left_ts is
    # inclusive), with right rows at equal ts ordered by the tiebreaks so the
    # running "last" is the max-tiebreak row — matching the window-dedup
    # operator's (right_ts desc, tiebreak desc) pick.
    order = [F.col("__ts").asc(), F.col("__is_left").asc()] + [
        F.col(f"__tb_{t}").asc_nulls_first() for t in tiebreak
    ]
    w = (
        Window.partitionBy(*[F.col(f"__k_{k}") for k in on])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the winning right row ATOMICALLY as one struct: a per-column
    # last(ignorenulls) would back-fill a legitimately-NULL column of the
    # latest right row from an OLDER row — mixing fields across rows (and
    # across the TTL horizon). A right row always produces a non-null struct
    # (its __rts field is non-null), so ignorenulls only skips left rows.
    carried = u.select(
        "*",
        F.last(
            F.when(
                F.col("__is_left") == 0,
                F.struct(
                    F.col("__ts").alias("__rts"),
                    *[F.col(f"__r_{c}").alias(c) for c in r_payload],
                ),
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("__c"),
    ).where(F.col("__is_left") == 1)

    in_ttl = (
        F.lit(True)
        if ttl_seconds is None
        else (
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__c.__rts"))
            <= F.lit(int(ttl_seconds * 1_000_000))
        )
    )
    keep = F.col("__c").isNotNull() & in_ttl
    out_cols = [F.col(f"__l_{c}").alias(c) for c in l_payload] + [
        F.when(keep, F.col(f"__c.{c}")).alias(c) for c in r_payload
    ]
    return carried.select(*out_cols)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_id: str,
    r_id: str,
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
    keys: Sequence[str] | None = None,
    bin_seconds: int = 7 * 86400,
) -> DataFrame:
    """Interval-overlap join: (l_id, r_id) pairs whose CLOSED intervals
    [l_start, l_end] and [r_start, r_end] intersect, optionally restricted
    to equal ``keys``. Spark has no native range join, and the naive
    ``ON ls <= re AND rs <= le`` predicate compiles to a broadcast
    nested loop (or a per-key cartesian under equi keys) — quadratic on
    busy keys. This is the standard BINNED formulation instead: each
    interval explodes to the ``bin_seconds``-wide bins it covers, the two
    sides equi-join on (keys..., bin) — a plain shuffled hash join — the
    exact overlap predicate filters the candidates, and pair dedup removes
    multi-bin duplicates. Shuffle volume is rows × avg-bins-per-interval;
    pick ``bin_seconds`` near the typical interval length so avg-bins ≈ 2.

    Reference parity: the reference has no interval analytics at all; this
    is the J7/as-of family generalized from point-in-interval to
    interval-vs-interval.
    """
    from real_time_recommendation_system_with_feature_store_spark.ident import qcol

    keys = list(keys or [])
    lk = [qcol(k).alias(f"__k{i}") for i, k in enumerate(keys)]
    rk = [qcol(k).alias(f"__k{i}") for i, k in enumerate(keys)]
    kcols = [f"__k{i}" for i in range(len(keys))]

    def bins(s, e):
        return F.sequence(
            F.floor(F.unix_timestamp(s) / F.lit(bin_seconds)),
            F.floor(F.unix_timestamp(e) / F.lit(bin_seconds)),
        )

    lb = left.select(
        *lk,
        qcol(l_id).alias("__lid"),
        qcol(l_start).alias("__ls"),
        qcol(l_end).alias("__le"),
    ).withColumn("__bin", F.explode(bins(F.col("__ls"), F.col("__le"))))
    rb = right.select(
        *rk,
        qcol(r_id).alias("__rid"),
        qcol(r_start).alias("__rs"),
        qcol(r_end).alias("__re"),
    ).withColumn("__bin", F.explode(bins(F.col("__rs"), F.col("__re"))))
    cand = lb.join(rb, [*kcols, "__bin"]).where(
        (F.col("__ls") <= F.col("__re")) & (F.col("__rs") <= F.col("__le"))
    )
    out = cand.dropDuplicates(["__lid", "__rid", *kcols])
    return out.select(
        *[F.col(f"__k{i}").alias(k) for i, k in enumerate(keys)],
        F.col("__lid").alias(l_id),
        F.col("__rid").alias(r_id),
        F.col("__ls").alias(l_start if l_start != r_start else f"l_{l_start}"),
        F.col("__le").alias(l_end if l_end != r_end else f"l_{l_end}"),
        F.col("__rs").alias(r_start if l_start != r_start else f"r_{r_start}"),
        F.col("__re").alias(r_end if l_end != r_end else f"r_{r_end}"),
    )
