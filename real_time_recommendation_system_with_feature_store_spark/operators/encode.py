"""Encoders / scalers — SURVEY.md §2.8 F19, §2.4 A7/A8.

``label_encode`` is deliberately NOT Spark ML's StringIndexer: indexer order
is frequency-based and ties are nondeterministic, which breaks oracle
reproducibility (SURVEY.md §4.3). dense_rank over sorted distinct values is
stable, parallel, and matches a SQL oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_encode(df: DataFrame, col: str, out_col: str | None = None, start: int = 0) -> DataFrame:
    """F19: deterministic dense integer codes by sorted value order.

    Reference: sklearn LabelEncoder.fit_transform (src/data/movielens.py:299-303).
    Codes assigned 0..n-1 in ascending value order. The distinct side is tiny
    (vocabulary), so the code map broadcasts back onto the facts.
    """
    out_col = out_col or f"{col}_idx"
    vocab = (
        df.select(col).distinct()
        .withColumn(out_col, F.dense_rank().over(Window.orderBy(F.col(col).asc())) - 1 + start)
    )
    return df.join(F.broadcast(vocab), col, "left")


def zscore_scale(df: DataFrame, cols: list[str], suffix: str = "_z") -> DataFrame:
    """A8/F18: (x - mean)/(std + 1e-8), stats via one grouped pass broadcast
    back as literals-free cross join (single-row frame → broadcast nested loop).

    Reference: StandardScaler / manual z-score (movielens.py:421-422).
    """
    aggs = []
    for c in cols:
        aggs += [F.avg(c).alias(f"__m_{c}"), F.stddev(c).alias(f"__s_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        out = out.withColumn(c + suffix, (F.col(c) - F.col(f"__m_{c}")) / (F.col(f"__s_{c}") + F.lit(1e-8)))
    return out.drop(*[f"__m_{c}" for c in cols], *[f"__s_{c}" for c in cols])


def minmax_scale(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """A7: x / max(x) normalization (reference feature_engineering.py:344)."""
    out_col = out_col or f"{col}_norm"
    stats = df.agg(F.max(col).alias("__mx"))
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, F.col(col) / F.col("__mx"))
        .drop("__mx")
    )
