"""Iterative k-core filtering — SURVEY.md §2.4 A12.

Reference (src/data/movielens.py:345-382): repeat {count per user, drop
users < min; count per item, drop items < min} for a fixed number of
iterations. Driver-side loop over lazy DataFrames; each iteration is a
groupBy-count + broadcast-able semi join.

Scale: counts are tiny relative to facts (|users| rows), so each semi join
broadcasts. Lineage grows per iteration — with fixed iterations (3 in the
reference) that's fine; for fixpoint loops, checkpoint every few rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore_filter(
    df: DataFrame,
    user_col: str,
    item_col: str,
    min_user: int = 5,
    min_item: int = 5,
    iterations: int = 3,
) -> DataFrame:
    # Persist the input once: every iteration re-reads it twice (count pass +
    # semi-join probe), and without a cache that means 6 source scans — at
    # 100 TB, 6 full passes of parse/decode. On a cluster this would be
    # persist(StorageLevel.MEMORY_AND_DISK) or a checkpoint.
    # Per-iteration persists stack (≤ ``iterations`` cached levels of a
    # shrinking table): each level is referenced twice by the next round
    # (count pass + semi-join probe), so eagerly unpersisting would double
    # that branch's recomputation per round. Callers running many k-cores in
    # one session can spark.catalog.clearCache() between them.
    out = df.persist()
    for _ in range(iterations):
        user_ok = out.groupBy(user_col).agg(F.count("*").alias("__n")).where(F.col("__n") >= min_user).select(user_col)
        out = out.join(F.broadcast(user_ok), user_col, "left_semi")
        item_ok = out.groupBy(item_col).agg(F.count("*").alias("__n")).where(F.col("__n") >= min_item).select(item_col)
        out = out.join(F.broadcast(item_ok), item_col, "left_semi").persist()
    return out
