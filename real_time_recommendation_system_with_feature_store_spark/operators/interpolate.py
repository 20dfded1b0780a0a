"""Time-series gap interpolation — feature-pipeline repair for missing
sensor/metric points (the step between the date-spine gap-fill, which
creates the missing rows, and model-ready features).

``interpolate_linear`` fills NULL values per entity by linear interpolation
between the nearest non-null neighbors in time: ONE shuffle on the entity
key, then two window passes over the same (key, time) sort — a struct-carry
``last(..., ignorenulls)`` looking back and ``first(..., ignorenulls)``
looking forward — so Catalyst reuses a single Exchange+Sort for all four
window expressions. Leading/trailing gaps clamp to the nearest known value
(pandas ``interpolate(limit_direction='both')`` semantics); entities with
no known value at all stay NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.ident import qcol


def interpolate_linear(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: list[str] | None = None,
    out_col: str = "value_interp",
) -> DataFrame:
    """Fill NULL ``value_col`` rows by per-``key`` linear interpolation in
    ``ts_col`` order (``order_tiebreak`` makes ties total — required for
    determinism when timestamps repeat). Non-null rows pass through
    unchanged; interpolated values round half-up to 6dp for cross-engine
    stability."""
    tie = [qcol(c) for c in (order_tiebreak or [])]
    order = [qcol(ts_col), *tie]
    prev_w = Window.partitionBy(qcol(key)).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    next_w = Window.partitionBy(qcol(key)).orderBy(*order).rowsBetween(
        1, Window.unboundedFollowing
    )
    point = F.when(
        qcol(value_col).isNotNull(),
        F.struct(
            F.unix_micros(qcol(ts_col)).alias("t"), qcol(value_col).alias("v")
        ),
    )
    prev = F.last(point, ignorenulls=True).over(prev_w)
    nxt = F.first(point, ignorenulls=True).over(next_w)
    lerp = F.col("__p.v") + (F.col("__x.v") - F.col("__p.v")) * (
        (F.unix_micros(qcol(ts_col)) - F.col("__p.t"))
        / (F.col("__x.t") - F.col("__p.t"))
    )
    filled = (
        F.when(qcol(value_col).isNotNull(), qcol(value_col))
        .when(
            F.col("__p").isNotNull() & F.col("__x").isNotNull()
            # equal neighbor timestamps would divide by zero; both carry a
            # legal fill value — take the earlier one (matches the clamp)
            & (F.col("__x.t") != F.col("__p.t")),
            F.round(lerp, 6),
        )
        .when(F.col("__p").isNotNull(), F.col("__p.v"))
        .when(F.col("__x").isNotNull(), F.col("__x.v"))
    )
    return (
        df.withColumn("__p", prev)
        .withColumn("__x", nxt)
        .withColumn(out_col, filled)
        .drop("__p", "__x")
    )
