"""In-engine embedding production — closes the reference's model lifecycle.

The reference trains a two-tower torch model to produce user/item embeddings
(src/models/two_tower.py:516-546, driven by scripts/train_movielens.py) which
its FAISS index then serves. Torch training is out of scope here (SURVEY
§3.2); the public-knowledge Spark-native stand-in is ALS matrix
factorization (``pyspark.ml.recommendation.ALS``) over implicit feedback —
the classic Hu/Koren/Volinsky 2008 formulation, distributed by Spark ML as
block-wise alternating least squares (no driver-side gradient loop).

The produced ``(id, embedding)`` table is schema-compatible with the
``embeddings`` table every ANN tier in ``operators/knn.py`` consumes, so the
full reference lifecycle — interactions → train → embed → index → retrieve —
runs inside the engine.

Scale: ALS is the one iterative-ML piece; Spark ML blocks the factor
matrices so each iteration is a pair of keyed joins + least-squares solves —
no full-matrix gather. At 100 TB of interactions, pre-aggregate to (user, item,
strength) first (done below: the per-pair event count IS the strength), which
shrinks the training input to the distinct interaction pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fit_als(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    rank: int = 16,
    reg_param: float = 0.1,
    max_iter: int = 10,
    alpha: float = 10.0,
    seed: int = 42,
):
    from pyspark.ml.recommendation import ALS

    pairs = (
        interactions.groupBy(user_col, item_col)
        .agg(F.count("*").alias("__strength"))
        .select(
            # try_cast: an id outside int32 becomes NULL instead of silently
            # WRAPPING (non-ANSI cast), which would fabricate/collide ids.
            # Column.try_cast (not f-string SQL) so names needing backticks
            # (spaces, dots, hyphens) resolve like every other F.col use
            F.col(user_col).try_cast("int").alias("__u"),
            F.col(item_col).try_cast("int").alias("__i"),
            F.col("__strength").cast("float"),
        )
    )
    bad = pairs.where(F.col("__u").isNull() | F.col("__i").isNull()).limit(1).count()
    if bad:
        raise ValueError(
            f"ALS ids must fit int32: {user_col}/{item_col} contain values outside "
            "[-2^31, 2^31) (or non-numeric) — dense-encode them first "
            "(operators/encode.label_encode)"
        )
    als = ALS(
        userCol="__u",
        itemCol="__i",
        ratingCol="__strength",
        implicitPrefs=True,
        rank=rank,
        regParam=reg_param,
        maxIter=max_iter,
        alpha=alpha,
        seed=seed,
        coldStartStrategy="drop",
    )
    return als.fit(pairs)



def _factors_df(factors: DataFrame, id_out: str) -> DataFrame:
    return factors.select(
        F.col("id").cast("long").alias(id_out),
        F.transform("features", lambda x: x.cast("double")).alias("embedding"),
    )


def train_embeddings(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    rank: int = 16,
    reg_param: float = 0.1,
    max_iter: int = 10,
    alpha: float = 10.0,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """ONE factorization, both towers: returns ``(user_df, item_df)`` —
    each ``(id, embedding array<double>)`` — from a single ALS fit, so the
    same-factorization guarantee between query and item towers is
    structural, not a same-seed coincidence, and callers needing both pay
    the iterative cost once.

    Event multiplicity becomes the implicit confidence strength (one
    groupBy — the only pass over the raw interaction log). ALS ids must be
    32-bit ints; callers with wider keys should pass a dense-encoded column
    (operators/encode.py) and re-attach the natural key.
    """
    model = _fit_als(
        interactions, user_col, item_col,
        rank=rank, reg_param=reg_param, max_iter=max_iter, alpha=alpha, seed=seed,
    )
    return _factors_df(model.userFactors, user_col), _factors_df(model.itemFactors, item_col)


def train_item_embeddings(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    **als_kwargs,
) -> DataFrame:
    """Item tower only — the drop-in producer for the embeddings table the
    knn/ANN operators consume. Needing both towers? ``train_embeddings``
    shares one fit."""
    return train_embeddings(interactions, user_col, item_col, **als_kwargs)[1]


def train_user_embeddings(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    **als_kwargs,
) -> DataFrame:
    """User tower only; see ``train_embeddings`` to get both from one fit."""
    return train_embeddings(interactions, user_col, item_col, **als_kwargs)[0]
