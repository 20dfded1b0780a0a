"""Ordered conversion funnel over per-entity event sequences.

Stage semantics (the classic product-analytics contract): stage 0's time is
the entity's FIRST stage-0 event; stage k's time is the first stage-k event
AT OR AFTER the entity's stage k-1 time. An entity "converts" through stage
k iff that chain is non-null.

Scale shape: ONE fact shuffle. Events group to per-entity struct arrays
and the whole ordered chain evaluates as nested JVM-side array folds
(``filter``/``transform``/``array_min`` higher-order functions — no Python,
no re-scan, no self-joins); the counts aggregate the tiny staged frame. The
textbook alternative is one self-join per stage — three passes over the
fact table for a 3-stage funnel. Per-entity event counts are bounded in any
real funnel window, so the collected arrays stay executor-sized.

The reference's streaming metrics are flat per-event-type counters
(src/streaming/kafka_consumer.py:259-331 five-minute aggregates); an
ordered same-entity chain is exactly what those counters cannot express.

Streaming twin: ``streaming/pipeline.py::funnel_state_stream`` maintains a
compacted per-entity event state in epoch partitions;
``funnel_stage_times`` over the folded state equals the batch computation
row-for-row (parity-tested) because the state is a sufficient statistic —
stage-0 and non-stage types compact to per-entity minima, later stages keep
distinct timestamps (a later-arriving EARLIER stage-0 event can admit
previously-irrelevant stage-k events, so their history must survive).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.ident import qcol

_FUNNEL_INTERNAL = ("__fn_seq",)


def funnel_stage_times(
    df: DataFrame,
    steps: Sequence[str],
    group_cols: Sequence[str],
    ts_col: str = "ts",
    type_col: str = "event_type",
    stage_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-entity stage-first timestamps: ``(group..., t_<step>...)``.

    One groupBy collects each entity's ``(ts, type)`` structs; each stage
    time is an ``array_min`` over a filtered/transformed view of that one
    array — the chained at-or-after predicate runs entirely inside
    whole-stage-codegen'd higher-order functions. Entities with no
    stage-k-qualifying event get NULL from ``t_<step k>`` onward.
    """
    if not steps:
        raise ValueError("funnel_stage_times: need at least one step")
    names = list(stage_cols) if stage_cols is not None else [f"t_{s}" for s in steps]
    if len(names) != len(steps):
        raise ValueError("funnel_stage_times: stage_cols must match steps")
    clash = (set(_FUNNEL_INTERNAL) | set(names)) & set(df.columns)
    if clash:
        raise ValueError(
            f"funnel_stage_times: input columns collide with stage/internal "
            f"names: {sorted(clash)}"
        )
    seqs = df.groupBy(*[qcol(c) for c in group_cols]).agg(
        F.collect_list(
            F.struct(qcol(ts_col).alias("__ts"), qcol(type_col).alias("__et"))
        ).alias("__fn_seq")
    )

    def first_ts(seq: Column, typ: str, lower: Column | None = None) -> Column:
        def pred(x):
            ok = x["__et"] == typ
            if lower is not None:
                ok = ok & F.coalesce(
                    lower.isNotNull() & (x["__ts"] >= lower), F.lit(False)
                )
            return ok

        return F.array_min(F.transform(F.filter(seq, pred), lambda x: x["__ts"]))

    staged = seqs.withColumn(names[0], first_ts(F.col("__fn_seq"), steps[0]))
    for i in range(1, len(steps)):
        staged = staged.withColumn(
            names[i], first_ts(F.col("__fn_seq"), steps[i], F.col(names[i - 1]))
        )
    return staged.drop("__fn_seq")


def funnel_summary(
    staged: DataFrame,
    steps: Sequence[str],
    stage_cols: Sequence[str] | None = None,
    n_entities_col: str = "n_pairs",
) -> DataFrame:
    """One-row funnel summary off a staged frame: total entity count,
    per-stage converted counts (``n_<step>``), and consecutive-stage
    conversion ratios (``<a>_to_<b>``, 6dp — NULL when the upstream stage
    converted nobody)."""
    names = list(stage_cols) if stage_cols is not None else [f"t_{s}" for s in steps]
    agg = staged.agg(
        F.count("*").alias(n_entities_col),
        *[F.count(names[i]).alias(f"n_{s}") for i, s in enumerate(steps)],
    )
    ratios = [
        F.round(
            F.col(f"n_{b}").cast("double") / F.col(f"n_{a}"), 6
        ).alias(f"{a}_to_{b}")
        for a, b in zip(steps, steps[1:])
    ]
    return agg.select(
        n_entities_col, *[f"n_{s}" for s in steps], *ratios
    )
