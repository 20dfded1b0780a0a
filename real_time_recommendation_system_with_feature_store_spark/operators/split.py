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
) -> DataFrame:
    """O3: label rows train/val/test by position in time order.

    pandas uses ``int(n*0.8)`` row boundaries (movielens.py:186-193):
    row_number <= floor(n*train) => train, <= floor(n*(train+val)) => val.
    ``order_by`` must include a unique tiebreak for determinism.

    Scale: a global row_number() is a single-partition sort in the naive
    form; we rank with a two-level trick-free global window only because the
    split is inherently a total order. At 100 TB use the percentile cut
    (percent_rank on a pre-sorted, range-partitioned layout) or split on the
    timestamp value itself.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.orderBy(*cols)
    n = df.count()
    train_end = int(n * train_frac)
    val_end = int(n * (train_frac + val_frac))
    return df.withColumn("__rn", F.row_number().over(w)).withColumn(
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
