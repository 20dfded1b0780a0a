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
    method: str = "exact",
    cms_depth: int = 4,
    cms_width: int = 4096,
) -> DataFrame:
    """Top-``top`` heaviest keys with global share: (key cols..., n_rows,
    share, rank). ``share`` uses the table's total rows (broadcast 1-row
    agg), so a single key with share >> 1/shuffle_partitions is the
    salting/AQE-skew signal.

    ``method="exact"`` (default): one aggregation then
    TakeOrderedAndProject on the key-count frame — the full key
    distribution is never sorted, but per-executor partial-agg state is
    O(|distinct keys in partition|).

    ``method="cms"``: count-min tier (operators/sketches.py) — per-executor
    state is bounded at ``cms_depth*cms_width`` cells no matter the key
    cardinality, and the sketch merges across days/partitions without
    rescanning (build per-day, ``cms_merge``, then rank candidates against
    the merged sketch via ``key_skew_from_cms``). ``n_rows`` becomes the
    count-min estimate: >= truth, deterministic (md5 hashing), equal to
    truth when no candidate collides in all ``cms_depth`` rows; the total
    (share denominator) stays exact — it is the row-0 cell sum."""
    if method == "cms":
        from real_time_recommendation_system_with_feature_store_spark.operators.sketches import cms_build

        sketch = cms_build(df, _skew_key(key_cols), depth=cms_depth, width=cms_width)
        candidates = df.select(*[qcol(c) for c in key_cols]).distinct()
        return key_skew_from_cms(
            sketch, candidates, key_cols, top=top, depth=cms_depth, width=cms_width
        )
    counts = df.groupBy(*[qcol(c) for c in key_cols]).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    tot = counts.agg(F.sum("n_rows").alias("__t"))
    return _ranked_share(counts, key_cols, top, tot)


def _skew_key(key_cols: list[str]):
    """Composite sketch key: NULLs coalesce to a chr(0) sentinel so a NULL
    component neither drops (concat_ws NULL-skip) nor merges with the
    empty string."""
    parts = [F.coalesce(qcol(c).cast("string"), F.lit("\x00")) for c in key_cols]
    return F.concat_ws("\x1e", *parts)


def key_skew_from_cms(
    sketch: DataFrame,
    candidates: DataFrame,
    key_cols: list[str],
    top: int = 20,
    depth: int = 4,
    width: int = 4096,
    salt: str = "cm",
) -> DataFrame:
    """Skew report from a PRE-BUILT (possibly merged) count-min sketch —
    the 100 TB flow: per-day ``cms_build`` sketches merged with
    ``cms_merge``, ranked here against a candidate key frame without ever
    rescanning the facts. Same output schema as ``key_skew_report``; the
    share denominator is exact (row-0 cell sum of the sketch)."""
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import cms_estimate

    # materialize ONCE: the sketch plan is referenced depth+1 times below
    # (per-row estimate filters + the total); an unmaterialized cms_build
    # would replay its fact scan per reference. <= depth*width rows.
    sketch = sketch.localCheckpoint(eager=True)
    est = cms_estimate(
        candidates,
        sketch,
        _skew_key(key_cols),
        depth=depth,
        width=width,
        salt=salt,
        out_col="n_rows",
        # callers hand this function a materialized (checkpointed / stored /
        # merged-and-read) sketch; skip the redundant re-checkpoint
        materialize=False,
    )
    tot = sketch.where(F.col("row") == 0).agg(F.sum("cell_count").alias("__t"))
    return _ranked_share(est, key_cols, top, tot)


def _ranked_share(
    counts: DataFrame, key_cols: list[str], top: int, tot: DataFrame
) -> DataFrame:
    """Shared tail of the skew reports: TakeOrdered top keys by n_rows
    (total tie-break on the keys), share against the broadcast 1-row
    total."""
    from real_time_recommendation_system_with_feature_store_spark.operators.topk import global_topn_ranked

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
