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
    oversample: int = 4,
) -> DataFrame:
    """SE1: per-user negatives by hash-bucketed rejection sampling,
    deterministic and never materializing the |users|×|items| grid.

    Reference semantics: set difference + np.random.choice
    (src/data/movielens.py:488-512). Each user draws ``oversample *
    n_per_user`` candidate indices — draw ``t`` maps to item index
    ``floor(hash_unit(salt, user, t) * |items|)`` — duplicates collapse to
    their first draw, draws that hit a positive are rejected (anti join),
    survivors rank by draw order and the first ``n_per_user`` win.

    Scale: work is O(|users| · k·n) rows, independent of catalog size — the
    draw frame is narrow, the item-index join keys on a dense bigint (AQE
    broadcasts the index when small), and the positives anti join shuffles on
    the natural (user, item) key. The only catalog-sized step is building the
    dense item index (one global row_number — at 1e9 items precompute it once
    as a dimension table instead of per query). Undershoot below n_per_user
    needs a user whose positives cover most of k·n distinct draws — raise
    ``oversample`` when positives approach catalog size.
    """
    n_draws = oversample * n_per_user
    idx = (
        items.select(item_col)
        .distinct()
        .select(
            F.col(item_col),
            (F.row_number().over(Window.orderBy(F.col(item_col).asc())) - 1).alias("__i"),
        )
    )
    n_items = idx.count()
    users = interactions.select(user_col).distinct()
    draws = users.select(
        F.col(user_col), F.explode(F.sequence(F.lit(0), F.lit(n_draws - 1))).alias("__t")
    )
    u = hash_unit(F.lit(salt), F.col(user_col), F.col("__t"))
    draws = draws.withColumn("__i", F.floor(u * F.lit(float(n_items))).cast("long"))
    cand = (
        draws.join(idx, "__i")
        .join(interactions.select(user_col, item_col).distinct(), [user_col, item_col], "left_anti")
        .groupBy(user_col, item_col)
        .agg(F.min("__t").alias("__t"))
    )
    w = Window.partitionBy(user_col).orderBy(F.col("__t").asc(), F.col(item_col).asc())
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_user)
        .select(user_col, item_col)
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
