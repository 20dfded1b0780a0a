"""Incremental view maintenance (IVM) for distributive aggregates.

``merge.py`` maintains a ROW-level snapshot from a CDC changelog; this
module maintains an AGGREGATED rollup (sum/count per group) from the same
kind of changelog WITHOUT re-aggregating the base — the classic
delta-propagation rule for distributive aggregates (self-maintainable
views: inserts contribute ``+measure``, deletes ``-measure``, updates
``new - old``). At 100 TB the difference is the whole point: the
incremental path shuffles only the DELTA (bounded by the day's changes),
touches only the changed groups via an outer merge, and never rescans the
base fact table — a nightly rollup refresh costs O(|delta|), not
O(|history|).

Reference tie: the reference recomputes its popularity/statistics tables
from scratch per run (eager pandas aggregation over the full interaction
frame, src/evaluation/metrics.py:467-477, src/features/
simple_feature_store.py:73-89); this operator is that computation's
incremental form.

Spark-first shape: ONE aggregation over the delta (map-side partial, the
same hash partitioning as any groupBy), then a full-outer merge onto the
materialized aggregate keyed by the group columns — full-outer joins
cannot broadcast in Spark, so the zero-view-shuffle layout is the SAME
bucketed-base pattern merge_changelog uses (store the view bucketed by
the group keys; plan-asserted). Groups whose count reaches zero are
dropped (the view contains exactly the groups a full recompute would
produce, asserted by the golden tests and the catalog oracle).

Scope boundary (the honest one every IVM system has): count/sum — and
anything derived from them (avg, ratio, variance via sum-of-squares) —
are SELF-MAINTAINABLE under deletes; MIN/MAX are not (retracting the
current extremum needs the group's next-best value, i.e. a base
re-scan of that group). Maintain extrema with the sketches tier
(qsketch quantile bounds) or accept per-touched-group base re-reads.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.ident import qcol


def agg_delta(
    changes: DataFrame,
    keys: Sequence[str],
    measure: Column,
    op_col: str = "op",
    count_col: str = "n",
    sum_col: str = "total",
    extra_measures: dict[str, Column] | None = None,
) -> DataFrame:
    """Collapse a changelog into per-group (Δcount, Δsum…) contributions.

    ``op_col`` ∈ {'I' insert, 'D' delete}: an update arrives as its D/I
    pair (the lossless CDC convention — the pair may even land in
    different batches; delta aggregation is order-independent because
    + and − commute). The measure is cast to DECIMAL(28,10) before
    summing so retractions cancel EXACTLY — float partial sums would
    leave 1-ulp residue on groups that should return to zero, and those
    ghosts would keep the group alive in the view.

    ``extra_measures`` maintains additional sums (e.g. revenue AND
    quantity) in the SAME delta pass — one shuffle for all measures; the
    view side must carry matching column names and
    ``apply_agg_delta(extra_sum_cols=...)`` merges them.
    """
    op = qcol(op_col)
    sign = (
        F.when(op == "I", F.lit(1))
        .when(op == "D", F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(F.lit("agg_delta: unknown op "), op.cast("string"))
            ).cast("int")
        )
    )
    # negate in DOUBLE (an exact sign flip), THEN cast to decimal: a
    # decimal(28,10) × decimal(28,10) product would widen past Spark's
    # 38-digit cap and round differently from other engines
    def _signed(m: Column) -> Column:
        return F.sum(F.when(op == "I", m).otherwise(-m).cast("decimal(28,10)"))

    extras = extra_measures or {}
    return changes.groupBy(*[qcol(k) for k in keys]).agg(
        F.sum(sign).alias(count_col),
        _signed(measure).alias(sum_col),
        *[_signed(m).alias(name) for name, m in extras.items()],
    )


def apply_agg_delta(
    view: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    count_col: str = "n",
    sum_col: str = "total",
    null_safe_keys: bool = True,
    extra_sum_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge per-group delta contributions into a materialized
    (keys, count, sum) rollup: changed groups adjust, new groups appear,
    groups whose count reaches zero disappear — the result equals a full
    recompute over base+changes row-for-row (golden + oracle tested).

    Scale shape — the same contract as ``merge_changelog``: the
    full-outer join shuffles BOTH sides on the group keys unless the
    view is stored bucketed by them, in which case the view reads
    straight from buckets with ZERO view-side Exchange and only the
    delta (the day's changes, collapsed to one row per touched group)
    shuffles — plan-asserted in tests/test_plans.py. The same
    ``null_safe_keys`` trap applies verbatim: the null-safe default
    pairs NULL group keys (a groupBy emits NULL groups) but compiles to
    coalesce/isnull composite join keys that DEFEAT bucketing; pass
    False when group keys are non-null by contract and the view layout
    is bucketed.

    Guard: a delete for a group the view does not contain (count would go
    negative) means the changelog and the view disagree — fail loudly via
    an in-plan assert rather than materializing a negative-count group.
    """
    kcols = list(keys)
    sums = [sum_col, *extra_sum_cols]
    v = view.select(
        *[qcol(k).alias(f"__vk_{i}") for i, k in enumerate(kcols)],
        qcol(count_col).alias("__vn"),
        *[qcol(s).cast("decimal(28,10)").alias(f"__vs_{j}") for j, s in enumerate(sums)],
    )
    d = delta.select(
        *[qcol(k).alias(f"__dk_{i}") for i, k in enumerate(kcols)],
        qcol(count_col).alias("__dn"),
        *[qcol(s).cast("decimal(28,10)").alias(f"__ds_{j}") for j, s in enumerate(sums)],
    )
    cond = None
    for i in range(len(kcols)):
        if null_safe_keys:
            eq = F.col(f"__vk_{i}").eqNullSafe(F.col(f"__dk_{i}"))
        else:
            eq = F.col(f"__vk_{i}") == F.col(f"__dk_{i}")
        cond = eq if cond is None else (cond & eq)
    merged = v.join(d, cond, "full_outer")
    n_new = F.coalesce(F.col("__vn"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))
    zero = F.lit(0).cast("decimal(28,10)")
    s_news = [
        F.coalesce(F.col(f"__vs_{j}"), zero) + F.coalesce(F.col(f"__ds_{j}"), zero)
        for j in range(len(sums))
    ]
    guard = F.coalesce(
        F.assert_true(
            n_new >= 0,
            F.lit(
                "apply_agg_delta: group count went negative — the changelog "
                "retracts rows the view never contained"
            ),
        ).cast("long"),
        n_new.cast("long"),
    )
    return merged.select(
        *[
            F.coalesce(F.col(f"__vk_{i}"), F.col(f"__dk_{i}")).alias(k)
            for i, k in enumerate(kcols)
        ],
        guard.alias(count_col),
        *[s_news[j].alias(s) for j, s in enumerate(sums)],
    ).where(F.col(count_col) > 0)
