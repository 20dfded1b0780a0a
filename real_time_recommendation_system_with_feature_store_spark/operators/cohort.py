"""Cohort retention matrix — single-fact-shuffle growth analytics.

Cohort = the entity's first-activity period (day index), cells = distinct
entities active at each period offset, retention = cell / cohort size. The
reference's metrics stack has no longitudinal operator at all
(src/evaluation/metrics.py computes per-request ranking metrics); this is
the standard growth-analytics shape a production event pipeline reports
daily.

Scale shape: ONE fact shuffle. Per-entity ``(first_period,
collect_set(period))`` aggregates in a single pass; the set explodes to
(cohort, offset) rows — already distinct per entity-period, so no second
distinct — and the matrix aggregates the tiny exploded frame. Cohort size
arrives via a window max over the matrix (offset 0 always exists), never a
fact re-scan.

State bound: the per-entity collected set holds the entity's DISTINCT
active periods. For daily cohorts over bounded retention horizons (weeks
to a few years) that is at most a few thousand elements; a misconfigured
period column (per-second "days") would not be. ``max_offset`` bounds it
structurally: periods beyond the horizon are filtered BEFORE the collect
(a window min over the same entity partitioning — the filter rides the
one existing shuffle, no extra Exchange), so executor state is
``<= max_offset + 1`` elements per entity no matter the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.ident import qcol

_COHORT_INTERNAL = ("__coh_first", "__coh_days", "__coh_d")


def cohort_retention(
    df: DataFrame,
    entity_col: str,
    period_col: str,
    max_offset: int | None = None,
    out_cohort: str = "cohort_day",
    out_offset: str = "day_offset",
    out_n: str = "n_users",
    out_retention: str = "retention",
) -> DataFrame:
    """Retention matrix ``(out_cohort, out_offset, out_n, out_retention)``
    from an activity frame carrying an entity key and an INTEGER period
    index (e.g. ``unix_micros(ts) div 86400000000`` for days — exact
    integer arithmetic, no date-function parity risk).

    ``max_offset`` (inclusive) caps the horizon: activity more than
    ``max_offset`` periods after the entity's first period is dropped
    before any state accumulates, bounding the per-entity set the
    aggregate collects. Offset-0 rows always survive, so cohort sizes and
    the retention denominator are unchanged; omitted (None) keeps every
    offset (the bounded-horizon assumption is then the CALLER's contract).
    """
    clash = set(_COHORT_INTERNAL) & set(df.columns)
    if clash:
        raise ValueError(
            f"cohort_retention: input columns collide with reserved "
            f"internal names: {sorted(clash)}"
        )
    ent, per = qcol(entity_col), qcol(period_col)
    if max_offset is not None:
        if max_offset < 0:
            raise ValueError(f"cohort_retention: max_offset must be >= 0, got {max_offset}")
        # window min over the entity partition = the cohort period; the
        # filter runs before the collect_set so per-entity state is bounded
        # by the horizon. The window's hash partitioning is the SAME as the
        # groupBy key, so the plan still shuffles the facts exactly once.
        w = Window.partitionBy(ent)
        df = (
            df.withColumn("__coh_first", F.min(per).over(w))
            .where(per - F.col("__coh_first") <= max_offset)
            .drop("__coh_first")
        )
    per_entity = df.groupBy(ent).agg(
        F.min(per).alias("__coh_first"), F.collect_set(per).alias("__coh_days")
    )
    expl = per_entity.select(
        F.col("__coh_first"), F.explode("__coh_days").alias("__coh_d")
    ).select(
        "__coh_first", (F.col("__coh_d") - F.col("__coh_first")).alias(out_offset)
    )
    mat = expl.groupBy("__coh_first", out_offset).agg(F.count("*").alias(out_n))
    wc = Window.partitionBy("__coh_first")
    csize = F.max(F.when(qcol(out_offset) == 0, qcol(out_n))).over(wc)
    return mat.select(
        F.col("__coh_first").alias(out_cohort),
        out_offset,
        out_n,
        F.round(qcol(out_n).cast("double") / csize, 6).alias(out_retention),
    )
