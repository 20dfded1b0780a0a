"""Drift-monitoring operators — the feature-store health checks a serving
deployment runs between retrains, each as a reusable DataFrame transform.

The reference recomputes per-refresh feature statistics
(src/features/feature_engineering.py:195-204 mean/std snapshots) but has no
comparison-over-time operator; this module is that comparison, one member
per column kind:

* ``psi``                 — numeric, binned (population stability index)
* ``ks``                  — numeric, binning-free (exact two-sample
                            Kolmogorov–Smirnov on empirical CDFs)
* ``ks_sketch_cells``     — numeric at scale (the same KS on mergeable
                            log-bucket quantile-sketch CDFs; bounded state)
* ``chi_square``          — categorical mix (2×K homogeneity test)
* ``embedding_centroid``  — representation space (per-group unit-centroid
                            cosine between windows)

Every function takes a frame already carrying a 0/1 ``win`` column (0 =
baseline window, 1 = current) so callers choose the split — a timestamp
threshold, day partitions, an A/B flag — and every statistic is computed
for BOTH windows from ONE pass over the input (conditional aggregation;
never a per-window rescan). All outputs are driver-hash-stable: fixed-order
term folds where float sum order matters, max/min elsewhere, NULLs filtered
before any cumulative window (Spark orders NULLS FIRST where DuckDB windows
default NULLS LAST).

The catalog entries `feature_drift_psi`, `feature_drift_ks`,
`feature_drift_ks_sketch`, `event_type_drift_chisq`, `embedding_drift`, and
`drift_sketch_fold` (queries.py) exercise each member against a DuckDB
oracle; `tests/test_plans.py::test_drift_monitors_scan_events_once` pins
the one-scan plan shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi(
    df: DataFrame,
    value: str,
    by: list[str] | None = None,
    win: str = "win",
    bins: int = 10,
) -> DataFrame:
    """Population stability index per ``by`` group over ``bins``
    equal-width bins FROZEN from the baseline window's [min, max]
    (current-side outliers clamp into the edge bins — new mass outside
    the trained range is exactly what PSI should flag), Laplace-smoothed
    ((n+1)/(N+bins)) so empty bins stay finite:
    PSI = Σ (p_cur − p_base)·ln(p_cur/p_base).

    ONE scan (both windows counted in one conditional agg), baseline
    stats broadcast, the all-bins frame generated from ``sequence()`` so
    absent bins contribute their smoothed mass, and the bin terms fold
    in bin order on both engines (the fixed-order double-summation
    contract). Groups appearing only after the split have no baseline
    range and are excluded. Returns ``(by..., n_base, n_current, psi)``,
    6dp."""
    by = list(by) if by else []
    stats = (
        df.where(F.col(win) == 0)
        .groupBy(*by)
        .agg(F.min(value).alias("mn"), F.max(value).alias("mx"))
    )
    j = df.join(F.broadcast(stats), by)
    width = (F.col("mx") - F.col("mn")) / bins
    bin_ = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.greatest(
                F.floor((F.col(value) - F.col("mn")) / width).cast("int"),
                F.lit(0),
            ),
            F.lit(bins - 1),
        )
    )
    counts = j.groupBy(*by, bin_.alias("bin")).agg(
        F.count(F.when(F.col(win) == 0, 1)).alias("nb"),
        F.count(F.when(F.col(win) == 1, 1)).alias("nc"),
    )
    bframe = stats.select(
        *by, F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin")
    )
    filled = bframe.join(counts, [*by, "bin"], "left").fillna(0, ["nb", "nc"])
    tot = filled.groupBy(*by).agg(
        F.sum("nb").alias("tnb"), F.sum("nc").alias("tnc")
    )
    g = filled.join(tot, by)
    pb = (F.col("nb") + 1) / (F.col("tnb") + bins)
    pc = (F.col("nc") + 1) / (F.col("tnc") + bins)
    contrib = ((pc - pb) * F.log(pc / pb)).alias("contrib")
    return (
        g.select(*by, "tnb", "tnc", F.col("bin"), contrib)
        .groupBy(*by, "tnb", "tnc")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("bin"), F.col("contrib")))
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x["contrib"],
                ),
                6,
            ).alias("psi")
        )
        .select(
            *by,
            F.col("tnb").alias("n_base"),
            F.col("tnc").alias("n_current"),
            "psi",
        )
    )


def ks(
    df: DataFrame,
    value: str,
    by: list[str] | None = None,
    win: str = "win",
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov per ``by`` group:
    sup over observed values of |F_base(v) − F_current(v)|.

    One pass collapses to per-(group, value) conditional counts — the
    shuffle carries DISTINCT values, not rows — then one per-group
    cumulative window builds both CDFs and a per-group max finishes.
    NULL values are filtered (no place in a CDF). Groups present in only
    one window are excluded (no two-sample test exists). Returns
    ``(by..., n_base, n_current, ks_stat)``, 6dp.

    Scale note: per-group window cost is the distinct-value count; for a
    feature with ~1e9 distinct values per group, pre-quantize or use
    ``ks_sketch_cells`` (bounded state)."""
    from pyspark.sql import Window

    by = list(by) if by else []
    counts = (
        df.where(F.col(value).isNotNull())
        .groupBy(*by, value)
        .agg(
            F.count(F.when(F.col(win) == 0, 1)).alias("nb"),
            F.count(F.when(F.col(win) == 1, 1)).alias("nc"),
        )
    )
    return _cdf_gap(counts, by, order_cols=[value])


def ks_sketch_cells(cells: DataFrame, by: list[str] | None = None) -> DataFrame:
    """KS over two quantile-sketch CDFs, from a cell frame carrying
    per-(by..., __qs_msb, __qs_sub) window counts ``nb``/``nc`` — build it
    with ``operators.sketches.qsketch_build(by=[*by, win])`` pivoted, or by
    aligning two ``read_qsketch`` folds (full-outer on the bucket pair,
    zero-filled). State per group is O(log range × 2^sub_bits) cells no
    matter the distinct-value count; the statistic is the exact KS of the
    bucket-quantized distributions (error ≤ one relative bucket width)."""
    by = list(by) if by else []
    return _cdf_gap(cells, by, order_cols=["__qs_msb", "__qs_sub"])


def _cdf_gap(counts: DataFrame, by: list[str], order_cols: list[str]) -> DataFrame:
    from pyspark.sql import Window

    part = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(0))
    wcum = part.orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        *by,
        F.sum("nb").over(wcum).alias("cb"),
        F.sum("nc").over(wcum).alias("cc"),
        F.sum("nb").over(part).alias("tnb"),
        F.sum("nc").over(part).alias("tnc"),
    )
    return (
        cum.where((F.col("tnb") > 0) & (F.col("tnc") > 0))
        .groupBy(*by, "tnb", "tnc")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cb").cast("double") / F.col("tnb")
                        - F.col("cc").cast("double") / F.col("tnc")
                    )
                ),
                6,
            ).alias("ks_stat")
        )
        .select(
            *by,
            F.col("tnb").alias("n_base"),
            F.col("tnc").alias("n_current"),
            "ks_stat",
        )
    )


def chi_square(df: DataFrame, category: str, win: str = "win") -> DataFrame:
    """2×K chi-square homogeneity test on the ``category`` mix across the
    two windows: X² = Σ (O − E)²/E with E = row_total × col_total / N,
    dof = K − 1. One conditional-agg scan; totals via a single-partition
    window over the K-row counts frame (no second scan); the K terms fold
    in category order (the PSI fixed-order summation contract). Returns
    one row ``(n_base, n_current, dof, chi_square)``."""
    from pyspark.sql import Window

    c = df.groupBy(category).agg(
        F.count(F.when(F.col(win) == 0, 1)).alias("nb"),
        F.count(F.when(F.col(win) == 1, 1)).alias("nc"),
    )
    wall = Window.partitionBy(F.lit(0))
    g = c.select(
        category,
        "nb",
        "nc",
        F.sum("nb").over(wall).cast("double").alias("tb"),
        F.sum("nc").over(wall).cast("double").alias("tc"),
    # an empty window makes every expected count 0 — no two-sample test
    # exists (the KS/PSI exclusion contract); empty result, not a
    # divide-by-zero
    ).where((F.col("tb") > 0) & (F.col("tc") > 0))
    row_tot = F.col("nb") + F.col("nc")
    n = F.col("tb") + F.col("tc")
    eb = row_tot * F.col("tb") / n
    ec = row_tot * F.col("tc") / n
    db, dc = F.col("nb") - eb, F.col("nc") - ec
    term = (db * db / eb + dc * dc / ec).alias("term")
    return (
        g.select("tb", "tc", F.col(category).alias("__cat"), term)
        .groupBy("tb", "tc")
        .agg(
            (F.count("*") - 1).alias("dof"),
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__cat"), F.col("term")))
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x["term"],
                ),
                4,
            ).alias("chi_square"),
        )
        .select(
            F.col("tb").cast("long").alias("n_base"),
            F.col("tc").cast("long").alias("n_current"),
            "dof",
            "chi_square",
        )
    )


def embedding_centroid(
    df: DataFrame,
    vec: str,
    by: list[str] | None = None,
    win: str = "win",
) -> DataFrame:
    """Per-group unit-centroid cosine between the two windows' vectors
    (the label_centroid_margins Lloyd-mean step keyed by (group, window)):
    1.0 = stable, lower = the population moved in embedding space even
    when scalar features look flat. BOTH windows' per-dim means come from
    one conditional aggregation — a win-keyed split + self-join would
    re-execute the whole subtree. ``vec`` must be array<double>. Returns
    ``(by..., n_base, n_current, centroid_cos)``, 6dp; groups with
    vectors in only one window drop out."""
    from real_time_recommendation_system_with_feature_store_spark.functions.vectors import dot, l2_normalize

    by = list(by) if by else []
    # NULL vectors contribute nothing (posexplode skips NULL) — callers
    # that want the scan to SKIP null rows must pre-filter on the SOURCE
    # column (see embedding_drift): filtering here on a computed ``vec``
    # would be substituted below the projection by predicate pushdown and
    # re-evaluate the vector expression per row (guide §4.4)
    per_dim = (
        df.select(*by, win, F.posexplode(vec).alias("i", "x"))
        .groupBy(*by, "i")
        .agg(
            F.avg(F.when(F.col(win) == 0, F.col("x"))).alias("mb"),
            F.avg(F.when(F.col(win) == 1, F.col("x"))).alias("mc"),
            F.count(F.when(F.col(win) == 0, 1)).alias("nb"),
            F.count(F.when(F.col(win) == 1, 1)).alias("nc"),
        )
    )
    return (
        per_dim.groupBy(*by)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("i"), F.col("mb"), F.col("mc")))
            ).alias("pm"),
            F.min("nb").alias("n_base"),
            F.min("nc").alias("n_current"),
        )
        .where((F.col("n_base") > 0) & (F.col("n_current") > 0))
        .select(
            *by,
            "n_base",
            "n_current",
            F.round(
                dot(
                    l2_normalize(F.transform(F.col("pm"), lambda s: s["mb"])),
                    l2_normalize(F.transform(F.col("pm"), lambda s: s["mc"])),
                ),
                6,
            ).alias("centroid_cos"),
        )
    )
