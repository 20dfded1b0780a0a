"""Encoders / scalers — SURVEY.md §2.8 F19, §2.4 A7/A8.

``label_encode`` is deliberately NOT Spark ML's StringIndexer: indexer order
is frequency-based and ties are nondeterministic, which breaks oracle
reproducibility (SURVEY.md §4.3). dense_rank over sorted distinct values is
stable, parallel, and matches a SQL oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_encode(
    df: DataFrame,
    col: str,
    out_col: str | None = None,
    start: int = 0,
    small_vocab_bytes: int = 64 << 20,
) -> DataFrame:
    """F19: deterministic dense integer codes by sorted value order.

    Reference: sklearn LabelEncoder.fit_transform (src/data/movielens.py:299-303).
    Codes assigned 0..n-1 in ascending value order.

    Scale: the reference's primary F19 use is ID encoding (user_id/movie_id),
    where the "vocabulary" is every distinct id — millions to billions at
    100 TB. Cost-gated like time_fraction_split (split.py:44): a vocab whose
    optimizer plan-size estimate fits ``small_vocab_bytes`` takes the
    categorical path (one-task dense_rank over the tiny distinct frame +
    broadcast map join — cheapest, zero fact-side shuffle); anything larger
    ranks through ``global_row_number`` (range-partitioned parallel sort +
    broadcast offsets, rank.py) and maps back with a plain shuffle join —
    no single-executor sort, no driver-OOM broadcast. Both paths assign the
    identical codes (the order is total and values are distinct, so
    dense_rank == row_number == global rank); only the physical plan
    differs.
    """
    from real_time_recommendation_system_with_feature_store_spark.operators.kcore import _plan_size_bytes
    from real_time_recommendation_system_with_feature_store_spark.operators.rank import global_row_number

    out_col = out_col or f"{col}_idx"
    vocab = df.select(col).distinct()
    if _plan_size_bytes(vocab) <= small_vocab_bytes:
        vocab = vocab.withColumn(
            out_col, F.dense_rank().over(Window.orderBy(F.col(col).asc())) - 1 + start
        )
        return df.join(F.broadcast(vocab), col, "left")
    # int cast matches the small path's dense_rank type; codes are int32 by
    # contract — the downstream consumer (ALS, models.py) requires it, and a
    # >2^31-value vocab exceeds LabelEncoder semantics anyway
    vocab = global_row_number(vocab, [F.col(col).asc()], "__grn").select(
        col, (F.col("__grn") - 1 + start).cast("int").alias(out_col)
    )
    return df.join(vocab, col, "left")


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
