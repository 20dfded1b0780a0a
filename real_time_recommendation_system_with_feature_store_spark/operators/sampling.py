"""Deterministic sampling — SURVEY.md §2.7 SE1, §2.8 F25.

``rand(seed)`` in Spark is partition-order dependent, so every sampler here
derives pseudo-randomness from md5 of the row key (SURVEY.md §4.3): stable
under any partitioning/AQE re-plan AND expressible in the ANSI-SQL oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.functions.scalars import hash_unit


def hash_key(salt: str, *cols) -> F.Column:
    """md5 hex string of salt + key columns — a portable, deterministic
    pseudo-random SORT key (hex lexicographic order == numeric order)."""
    return F.md5(F.concat_ws("\x1f", F.lit(salt), *[c.cast("string") for c in cols]))


def hash_sample(df: DataFrame, keys: Sequence[str], fraction: float, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows chosen by key hash (deterministic)."""
    u = hash_unit(F.lit(salt), *[F.col(k) for k in keys])
    return df.where(u < F.lit(fraction))


def negative_sample(
    interactions: DataFrame,
    items: DataFrame,
    user_col: str,
    item_col: str,
    n_per_user: int,
    salt: str = "neg",
) -> DataFrame:
    """SE1: per-user negatives = (all items − user positives), deterministic
    pseudo-random pick of ``n_per_user``.

    Reference: set difference + np.random.choice (src/data/movielens.py:488-512).
    Spark shape: users × items candidate grid minus positives (anti join),
    ranked by hash_unit per user, take first n.

    Scale: the dense grid is |users|×|items| — only viable when the item dim
    is small (it is, in the reference: ~3.4k movies). For web-scale catalogs
    switch to hash-bucketed rejection sampling: draw k×n candidates by hashing
    (user, try_idx) into item ids, anti-join positives, rank, truncate.
    """
    users = interactions.select(user_col).distinct()
    grid = users.crossJoin(F.broadcast(items.select(item_col)))
    candidates = grid.join(interactions.select(user_col, item_col).distinct(), [user_col, item_col], "left_anti")
    u = hash_key(salt, F.col(user_col), F.col(item_col))
    w = Window.partitionBy(user_col).orderBy(u.asc(), F.col(item_col).asc())
    return (
        candidates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_user)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    keys: Sequence[str],
    weight,
    n: int,
    salt: str = "ws",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each row draws a deterministic uniform u from md5(salt, keys) and the
    top ``n`` rows by ``ln(u)/weight`` (desc) form the sample — inclusion
    probability proportional to weight, no replacement, and the result is
    replayable under any partitioning (rand(seed) is not).

    Scale: the selection key is a pure expression, so the global top-n
    compiles to TakeOrderedAndProject — per-partition partial top-n, no
    global sort, no shuffle of non-winners. The training-data use: corpus
    downsampling weighted by a quality/length score.
    """
    from real_time_recommendation_system_with_feature_store_spark.functions.scalars import hash_unit

    u = hash_unit(F.lit(salt), *[F.col(k) for k in keys])
    key = F.log(u) / weight
    tiebreaks = [F.col(k).asc() for k in keys]
    return (
        df.withColumn("__es", key)
        .orderBy(F.col("__es").desc(), *tiebreaks)
        .limit(n)
        .drop("__es")
    )
