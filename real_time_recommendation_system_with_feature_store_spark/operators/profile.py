"""Data profiling / skew diagnosis — the pre-flight checks a 100 TB
pipeline runs before committing to a join or agg strategy.

``profile_table`` is the ANALYZE-style one-pass column profile: a single
global aggregation (map-side partial, one tiny exchange) computes row/null/
distinct counts and min/max for every requested column, then one ``stack``
unpivots the 1-row result into per-column rows — the table is scanned ONCE
no matter how many columns are profiled. Exact distinct counts expand the
aggregate by |cols| (Spark's multi-distinct Expand); at lake scale pass
``exact=False`` for HLL-sketched distincts (approx_count_distinct), which
keeps the pass fully mergeable.

``key_skew_report`` is the heavy-hitter probe behind salting / AQE
decisions: top-N keys by row count with their global share, via
TakeOrderedAndProject (never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.ident import qcol


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool | None = None,
    exact_distinct_bytes: int = 1 << 30,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct, min_value,
    max_value) — min/max computed in the native type, then rendered as
    strings so one frame carries every column's profile. NULLs are excluded
    from n_distinct (COUNT(DISTINCT) semantics) and from min/max.

    ``exact=None`` (default) cost-gates the distinct counts: exact
    ``countDistinct`` only while the optimizer's input-size estimate fits
    ``exact_distinct_bytes`` — multi-column exact distinct compiles to
    Spark's Expand, multiplying the scan's rows by ~|cols| before the
    partial agg, which on the 100 TB table this profiler exists for is the
    wrong default. Larger inputs use HLL sketches
    (``approx_count_distinct``), keeping the pass a plain mergeable
    aggregation. Pass ``exact=True``/``False`` to force a path (same
    gate pattern as encode.py label_encode)."""
    from real_time_recommendation_system_with_feature_store_spark.operators.kcore import _plan_size_bytes

    cols = list(cols or df.columns)
    if exact is None:
        exact = _plan_size_bytes(df) <= exact_distinct_bytes
    distinct = (
        (lambda c: F.countDistinct(qcol(c)))
        if exact
        else (lambda c: F.approx_count_distinct(qcol(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.when(qcol(c).isNull(), 1).otherwise(0)).alias(f"__nn_{i}"),
            distinct(c).alias(f"__nd_{i}"),
            F.min(qcol(c)).cast("string").alias(f"__mn_{i}"),
            F.max(qcol(c)).cast("string").alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    # stack(k, name_i, nn_i, nd_i, mn_i, mx_i ...): 1 row -> |cols| rows;
    # column names enter as string literals, internals by positional alias,
    # so arbitrary source column names can't break the expression
    parts = []
    for i, c in enumerate(cols):
        lit = c.replace("'", "''")
        parts.append(f"'{lit}', __nn_{i}, __nd_{i}, __mn_{i}, __mx_{i}")
    stacked = one.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    top: int = 20,
) -> DataFrame:
    """Top-``top`` heaviest keys with global share: (key cols..., n_rows,
    share, rank). One aggregation then TakeOrderedAndProject on the (tiny)
    key-count frame — the full key distribution is never sorted. ``share``
    uses the table's total rows (broadcast 1-row agg), so a single key with
    share >> 1/shuffle_partitions is the salting/AQE-skew signal."""
    from real_time_recommendation_system_with_feature_store_spark.operators.topk import global_topn_ranked

    counts = df.groupBy(*[qcol(c) for c in key_cols]).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    tot = counts.agg(F.sum("n_rows").alias("__t"))
    ranked = global_topn_ranked(
        counts,
        [F.col("n_rows").desc(), *[qcol(c).asc() for c in key_cols]],
        top,
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        *[qcol(c) for c in key_cols],
        "n_rows",
        F.round(F.col("n_rows") / F.col("__t"), 6).alias("share"),
        "rank",
    )
