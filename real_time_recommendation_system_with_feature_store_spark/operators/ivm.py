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
re-scan of that group). ``apply_extrema_delta`` implements the standard
production answer — the DIRTY-GROUP rule: inserts tighten extrema in
place, and only groups whose delete touches a stored extremum
re-aggregate from the post-change snapshot via a targeted semi-join —
O(|delta|) plus the base rows of dirty groups, never a full rescan.
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


def _key_eq(n_keys: int, left: str, right: str, null_safe: bool) -> Column:
    cond = None
    for i in range(n_keys):
        if null_safe:
            eq = F.col(f"{left}{i}").eqNullSafe(F.col(f"{right}{i}"))
        else:
            eq = F.col(f"{left}{i}") == F.col(f"{right}{i}")
        cond = eq if cond is None else (cond & eq)
    return cond


def apply_extrema_delta(
    view: DataFrame,
    changes: DataFrame,
    base_after: DataFrame,
    keys: Sequence[str],
    measure_col: str,
    op_col: str = "op",
    min_col: str = "mn",
    max_col: str = "mx",
    null_safe_keys: bool = True,
    gate_df: DataFrame | None = None,
) -> DataFrame:
    """Maintain a per-group (MIN, MAX) rollup under a D/I changelog — the
    aggregates the module docstring's scope boundary calls out as NOT
    self-maintainable — via the dirty-group rule:

    * INSERTS only tighten extrema: merged in place with least/greatest,
      zero base access (new groups appear the same way).
    * A group goes DIRTY only when a delete TOUCHES a stored extremum
      (deleted value <= stored min or >= stored max — a consistent
      changelog only deletes values inside [min, max], so this is exactly
      "deletes the current extremum", duplicates included). Only dirty
      groups re-aggregate, from ``base_after`` — the post-change snapshot
      (``merge_changelog``'s output; the caller maintains it anyway) —
      restricted by a semi-join on the dirty keys. Deleting a group's
      LAST row necessarily touches both extrema, so group death falls out
      of the recompute returning no rows: no count column needed.
    * A delete for a group the view never contained fails loudly in-plan
      (the ``apply_agg_delta`` guard contract).

    Cost: O(|delta|) for the clean path + O(base rows of dirty groups)
    for the recompute — at 100 TB a day's deletes touch the extrema of
    a bounded set of groups, and only those groups' partitions re-read.
    The dirty-key semi-join side is stats-gated (``gated_broadcast``;
    the key frame derives from a join whose Catalyst estimate is
    garbage, so the gate reads ``gate_df`` — defaulting to the changes
    key projection, a sanely-estimated bound). The VIEW is consumed
    twice (the clean-branch merge and the dirty-key extraction both
    read the view⋈changes frame), so store it as a bucketed table —
    the ``apply_agg_delta`` layout contract — making both reads
    shuffle-free scans; for an in-memory view, persist it first.

    NULL measures are unsupported (min/max skip NULLs, so a NULL delete
    cannot be located against the stored extrema); NULL group KEYS follow
    the ``null_safe_keys`` contract of ``apply_agg_delta`` verbatim.
    """
    kcols = list(keys)
    m = qcol(measure_col)
    op = qcol(op_col)
    # A lazily-branched raise_error would never fire for rows NO branch
    # selects (an unknown op matches neither conditional agg), so count
    # the bad rows unconditionally — when() always evaluates its
    # CONDITION — and assert the count downstream on BOTH branches.
    is_bad_row = ~(((op == "I") | (op == "D")) & m.isNotNull())
    chg = changes.groupBy(
        *[qcol(k).alias(f"__ck_{i}") for i, k in enumerate(kcols)]
    ).agg(
        F.min(F.when(op == "I", m)).alias("__imn"),
        F.max(F.when(op == "I", m)).alias("__imx"),
        F.min(F.when(op == "D", m)).alias("__dmn"),
        F.max(F.when(op == "D", m)).alias("__dmx"),
        F.sum(F.when(is_bad_row, F.lit(1)).otherwise(F.lit(0))).alias("__nbad"),
    )
    v = view.select(
        *[qcol(k).alias(f"__vk_{i}") for i, k in enumerate(kcols)],
        qcol(min_col).alias("__vmn"),
        qcol(max_col).alias("__vmx"),
        F.lit(True).alias("__vp"),
    )
    merged = v.join(
        chg, _key_eq(len(kcols), "__vk_", "__ck_", null_safe_keys), "full_outer"
    )
    has_del = F.col("__dmn").isNotNull()
    dirty = F.coalesce(
        F.col("__vp")
        & has_del
        & ((F.col("__dmn") <= F.col("__vmn")) | (F.col("__dmx") >= F.col("__vmx"))),
        F.lit(False),
    )
    # clean path: in-place least/greatest merge (F.least/greatest skip
    # NULLs, so insert-only new groups and no-insert old groups both work)
    bad = (has_del & F.col("__vp").isNull()) | (
        F.coalesce(F.col("__nbad"), F.lit(0)) > 0
    )
    new_mn = F.coalesce(
        F.assert_true(
            ~bad,
            F.lit(
                "apply_extrema_delta: delete for a group the view never "
                "contained, unknown op, or NULL measure — changelog and "
                "view disagree / NULL measures unsupported"
            ),
        ).cast(view.schema[min_col].dataType),
        F.least("__vmn", "__imn"),
    )
    clean = merged.where(~dirty).select(
        *[
            F.coalesce(F.col(f"__vk_{i}"), F.col(f"__ck_{i}")).alias(k)
            for i, k in enumerate(kcols)
        ],
        new_mn.alias(min_col),
        F.greatest("__vmx", "__imx").alias(max_col),
    )
    # the bad-row assert must also cover groups routed to the recompute
    # branch (a dirty group can carry a bad changelog row too)
    dirty_guard = F.coalesce(
        F.assert_true(
            F.coalesce(F.col("__nbad"), F.lit(0)) == 0,
            F.lit(
                "apply_extrema_delta: unknown op or NULL measure in the "
                "changelog of a recomputed group"
            ),
        ).cast(view.schema[kcols[0]].dataType),
        F.col("__vk_0"),
    )
    dirty_keys = merged.where(dirty).select(
        dirty_guard.alias("__rk_0"),
        *[F.col(f"__vk_{i}").alias(f"__rk_{i}") for i in range(1, len(kcols))],
    )
    if gate_df is None:
        gate_df = changes.select(*[qcol(k) for k in kcols])
    from real_time_recommendation_system_with_feature_store_spark.plans.inspect import gated_broadcast

    b = base_after.select(
        *[qcol(k).alias(f"__bk_{i}") for i, k in enumerate(kcols)],
        m.alias("__bm"),
    )
    recomputed = (
        b.join(
            gated_broadcast(dirty_keys, gate_df=gate_df),
            _key_eq(len(kcols), "__bk_", "__rk_", null_safe_keys),
            "left_semi",
        )
        .groupBy(*[F.col(f"__bk_{i}") for i in range(len(kcols))])
        .agg(F.min("__bm").alias(min_col), F.max("__bm").alias(max_col))
        .select(
            *[F.col(f"__bk_{i}").alias(k) for i, k in enumerate(kcols)],
            min_col,
            max_col,
        )
    )
    return clean.unionByName(recomputed)
