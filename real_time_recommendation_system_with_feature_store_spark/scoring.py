"""Model scoring — SURVEY.md §2.10 U5, the engine's one genuine UDF class.

The reference scores candidates with torch two-tower forwards and
XGB/LGBM `predict_proba` (two_tower.py:481-514, ranking_models.py:129-150).
Spark shape: broadcast the (small) model artifact once, score in Arrow
batches via pandas_udf — no per-row Python, no model re-pickle per task.

A deterministic linear model ships as the reference implementation so the
scoring PATH is oracle-checkable (dot(w, x) + b is SQL-expressible); swapping
in a real sklearn/xgboost artifact changes only `predict`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class LinearModel:
    """Pickle-able scorer: score = w . x + b (stands in for any artifact with
    a .predict(np.ndarray) -> np.ndarray interface)."""

    weights: list[float]
    bias: float = 0.0

    def predict(self, X: np.ndarray) -> np.ndarray:
        return X @ np.asarray(self.weights, dtype="float64") + self.bias


@dataclass
class TreeEnsembleModel:
    """GBM-style additive tree ensemble with the same ``.predict(X)``
    contract as ``LinearModel`` — the deterministic stand-in for the
    reference's tree re-rankers (XGB/LGBM ``predict_proba`` behind one
    interface, src/models/ranking_models.py:129-150,273-294). Swapping in a
    pickled xgboost/lgbm artifact changes nothing downstream: the broadcast
    + pandas_udf path (``batch_scorer``/``score_and_rank``) only calls
    ``predict``.

    Trees are nested tuples — ``("leaf", value)`` or
    ``("split", feature_idx, threshold, left, right)`` with ``x[feature_idx]
    <= threshold`` routing left — so a fixed model is also expressible as
    nested SQL CASE (oracle-checkable). Evaluation is vectorized masked
    recursion: one boolean mask per split node over the whole Arrow batch,
    never a per-row Python loop.
    """

    trees: tuple
    base: float = 0.0
    learning_rate: float = 1.0

    def _eval(self, node, X: np.ndarray) -> np.ndarray:
        if node[0] == "leaf":
            return np.full(X.shape[0], float(node[1]), dtype="float64")
        _, fi, thr, left, right = node
        mask = X[:, fi] <= thr
        out = np.empty(X.shape[0], dtype="float64")
        out[mask] = self._eval(left, X[mask])
        out[~mask] = self._eval(right, X[~mask])
        return out

    def predict(self, X: np.ndarray) -> np.ndarray:
        out = np.full(X.shape[0], float(self.base), dtype="float64")
        for t in self.trees:  # fixed order: float sum must be reproducible
            out = out + self.learning_rate * self._eval(t, X)
        return out


def batch_scorer(spark, model, feature_cols: list[str]):
    """Build a pandas_udf scoring Column factory over broadcast ``model``.

    Returns fn(*cols) -> Column. The broadcast ships the model once per
    executor (not per task closure) — the pattern that matters at 1000
    executors.
    """
    bc = spark.sparkContext.broadcast(model)

    @F.pandas_udf(T.DoubleType())
    def score(*cols: pd.Series) -> pd.Series:
        X = np.column_stack([c.to_numpy(dtype="float64") for c in cols])
        return pd.Series(bc.value.predict(X))

    def apply(df_or_cols) -> Column:
        if isinstance(df_or_cols, DataFrame):
            return score(*[df_or_cols[c] for c in feature_cols])
        return score(*df_or_cols)

    return apply


def score_and_rank(
    df: DataFrame,
    scorer,
    key: str,
    feature_cols: list[str],
    k: int,
    id_col: str,
) -> DataFrame:
    """U5 + W2: batch-score candidates, keep top-k per key (the re-rank stage
    of the serving query, reference service.py:221-228)."""
    from real_time_recommendation_system_with_feature_store_spark.operators.topk import topk_per_key

    scored = df.withColumn("score", F.round(scorer(df), 6))
    return topk_per_key(scored, [key], [F.col("score").desc(), F.col(id_col)], k)
