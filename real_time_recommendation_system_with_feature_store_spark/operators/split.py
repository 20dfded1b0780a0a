"""Dataset splits — SURVEY.md §2.6 O1/O3, §2.5 W1, §2.3 J6.

Both splits reproduce the reference's pandas row-count semantics exactly
(int(n*frac) boundaries, src/data/movielens.py:162-202) so the DuckDB oracle
hash-matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_fraction_split(
    df: DataFrame,
    order_by: Sequence[Column | str],
    train_frac: float = 0.8,
    val_frac: float = 0.1,
    split_col: str = "split",
    small_input_bytes: int = 256 << 20,
) -> DataFrame:
    """O3: label rows train/val/test by position in time order.

    pandas uses ``int(n*0.8)`` row boundaries (movielens.py:186-193):
    row_number <= floor(n*train) => train, <= floor(n*(train+val)) => val.
    ``order_by`` must include a unique tiebreak for determinism.

    Scale: cost-gated like kcore_filter — the optimizer's plan-size estimate
    routes small inputs through the single-task global window (cheapest at
    test scale: one tiny shuffle) and everything larger through
    ``global_row_number`` (range-partitioned parallel sort + broadcast
    offsets, rank.py). Both paths produce the identical total-order rank, so
    the labels are bit-identical — only the physical plan differs.
    """
    from real_time_recommendation_system_with_feature_store_spark.operators.kcore import _plan_size_bytes
    from real_time_recommendation_system_with_feature_store_spark.operators.rank import global_row_number

    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    n = df.count()
    train_end = int(n * train_frac)
    val_end = int(n * (train_frac + val_frac))
    if _plan_size_bytes(df) <= small_input_bytes:
        ranked = df.withColumn("__rn", F.row_number().over(Window.orderBy(*cols)))
    else:
        ranked = global_row_number(df, cols, "__rn")
    return ranked.withColumn(
        split_col,
        F.when(F.col("__rn") <= train_end, F.lit("train"))
        .when(F.col("__rn") <= val_end, F.lit("val"))
        .otherwise(F.lit("test")),
    ).drop("__rn")


def leave_one_out_split(
    df: DataFrame,
    key: str,
    order_by: Sequence[Column | str],
    n_test: int = 1,
    split_col: str = "split",
) -> DataFrame:
    """W1/J6: last ``n_test`` rows per key (by recency) => test, rest train.

    Reference: groupby.tail + anti-filter (src/data/movielens.py:224-232).
    One window pass — no join needed (the anti-join is implicit in the
    complement predicate).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(key).orderBy(*cols)
    return df.withColumn("__rn", F.row_number().over(w)).withColumn(
        split_col, F.when(F.col("__rn") <= n_test, F.lit("test")).otherwise(F.lit("train"))
    ).drop("__rn")
