"""In-engine ranking-model TRAINING — the reference's last lifecycle stage.

The reference fits its re-rank models with XGB/LGBM ``fit`` on joined
interaction+user+item features (src/models/ranking_models.py:388-399; data
prep scripts/train.py::prepare_ranking_data) and serves them through
``predict_proba``. This module closes that loop Spark-first, producing
artifacts that plug straight into the existing scoring path
(scoring.py::batch_scorer → score_and_rank):

* ``fit_linear_regression`` — EXACT normal-equations OLS. The Gram matrix
  X'X and moment vector X'y are ONE distributed aggregation (map-side
  partial, decimal-exact and therefore order-independent — the float sums a
  naive implementation would use change with partitioning); the tiny
  (k+1)² system solves on the driver. For k ≤ 2 features the solve is
  Cramer's rule written term-for-term like the SQL oracle replays it, so
  the trained weights — and every downstream score — are bit-identical
  across engines: the trained-scorer CONTRACT is oracle-checkable, not just
  plausible. Larger k uses numpy's solver (still exact Gram, one scan).

* ``fit_gbt_reranker`` — distributed gradient-boosted trees via Spark ML
  (``pyspark.ml.classification.GBTClassifier``, public API), then the
  fitted java trees are EXTRACTED into the engine's own pure-Python
  ``TreeEnsembleModel`` (scoring.py) — the same broadcast-pandas_udf
  artifact the fixed-model queries score with, so "train in-engine, serve
  in-engine" holds with no JVM model object in the serving path (a java
  model handle is session-bound; the extracted artifact is a pickleable
  value that ships to any executor).

Scale: training IO is one pass for the linear path; GBT is Spark ML's
distributed histogram implementation (maxBins-quantized, per-iteration
tree aggregation) — both are cluster-sized, no driver-side data loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.ident import qcol
from real_time_recommendation_system_with_feature_store_spark.scoring import LinearModel, TreeEnsembleModel

# per-row products are cast to this decimal before summing: exact,
# order-independent aggregation (same contract as queries._dsum)
_GRAM_DECIMAL = "decimal(28,6)"


def _gram_sums(
    df: DataFrame, feature_cols: Sequence[str], label_col: str
) -> tuple[list[list[float]], list[float], int]:
    """One aggregation pass → (A, b, n) of the normal equations A·w = b
    with an intercept term prepended (x0 = 1). Sums are decimal-exact then
    converted to double — deterministic under any partitioning."""
    xs = [F.lit(1.0)] + [qcol(c).cast("double") for c in feature_cols]
    y = qcol(label_col).cast("double")
    m = len(xs)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i in range(m):
        for j in range(i, m):
            aggs.append(
                F.sum((xs[i] * xs[j]).cast(_GRAM_DECIMAL))
                .cast("double")
                .alias(f"__a_{i}_{j}")
            )
        aggs.append(
            F.sum((xs[i] * y).cast(_GRAM_DECIMAL)).cast("double").alias(f"__b_{i}")
        )
    row = df.agg(*aggs).collect()[0]
    A = [[0.0] * m for _ in range(m)]
    b = [0.0] * m
    for i in range(m):
        for j in range(i, m):
            A[i][j] = A[j][i] = row[f"__a_{i}_{j}"]
        b[i] = row[f"__b_{i}"]
    return A, b, row["__n"]


def _solve_cramer_2x2(A, b) -> list[float]:
    det = A[0][0] * A[1][1] - A[0][1] * A[1][0]
    if det == 0.0:
        raise ValueError("singular normal equations (collinear features?)")
    w0 = (b[0] * A[1][1] - A[0][1] * b[1]) / det
    w1 = (A[0][0] * b[1] - b[0] * A[1][0]) / det
    return [w0, w1]


def _solve_cramer_3x3(A, b) -> list[float]:
    # 3x3 Cramer with a FIXED term order — the SQL oracle spells out the
    # same expression tree, so IEEE doubles agree bit-for-bit across engines
    def det3(m):
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )

    def replace(col):
        return [
            [b[r] if c == col else A[r][c] for c in range(3)] for r in range(3)
        ]

    d = det3(A)
    if d == 0.0:
        raise ValueError("singular normal equations (collinear features?)")
    return [det3(replace(0)) / d, det3(replace(1)) / d, det3(replace(2)) / d]


def fit_linear_regression(
    df: DataFrame, feature_cols: Sequence[str], label_col: str
) -> LinearModel:
    """Exact OLS via distributed normal equations; returns the engine's
    ``LinearModel`` scoring artifact (bias = intercept).

    The single aggregation computes k(k+3)/2 + 1 sums in one scan — at
    100 TB this is a full read but NO shuffle beyond the one-row partial-agg
    combine. Degenerate designs (collinear features, empty input) raise
    rather than returning NaN weights."""
    A, b, n = _gram_sums(df, feature_cols, label_col)
    m = len(b)
    if n == 0:
        raise ValueError("fit_linear_regression: empty training input")
    if m == 2:
        w = _solve_cramer_2x2(A, b)
    elif m == 3:
        w = _solve_cramer_3x3(A, b)
    else:
        import numpy as np

        try:
            w = np.linalg.solve(np.asarray(A), np.asarray(b)).tolist()
        except np.linalg.LinAlgError as e:
            raise ValueError(f"singular normal equations: {e}") from e
    if not all(x == x and abs(x) != float("inf") for x in w):
        raise ValueError(
            f"fit_linear_regression: singular normal equations (collinear "
            f"features?) — weights {w}"
        )
    return LinearModel(weights=[float(x) for x in w[1:]], bias=float(w[0]))


# ------------------------------------------------------------------ GBT

def _extract_node(jnode):
    """Recursively convert a Spark ML java tree node into the engine's
    ``("split", fi, thr, left, right)`` / ``("leaf", value)`` tuples.
    Only continuous splits are supported (all engine features are numeric);
    Spark ML routes x <= threshold LEFT, matching TreeEnsembleModel._eval."""
    cls = jnode.getClass().getSimpleName()
    if cls == "InternalNode":
        split = jnode.split()
        if split.getClass().getSimpleName() != "ContinuousSplit":
            raise ValueError(
                "fit_gbt_reranker: categorical split in fitted tree — "
                "one-hot/ordinal-encode features instead (encode.py)"
            )
        return (
            "split",
            split.featureIndex(),
            float(split.threshold()),
            _extract_node(jnode.leftChild()),
            _extract_node(jnode.rightChild()),
        )
    return ("leaf", float(jnode.prediction()))


def fit_gbt_reranker(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    max_iter: int = 20,
    max_depth: int = 3,
    step_size: float = 0.1,
    seed: int = 42,
    subsampling_rate: float = 1.0,
) -> TreeEnsembleModel:
    """Distributed GBT training on a binary label (the reference's
    XGB/LGBM re-ranker slot, ranking_models.py:388-399), returned as the
    engine's pure-Python ``TreeEnsembleModel``.

    The extracted artifact reproduces the java model's raw margin exactly:
    Spark GBT classification predicts sign(sum_i weight_i * tree_i(x)) and
    the per-tree weights are (1.0, step, step, ...) — folded here by
    scaling every non-first tree's leaves by ``step_size`` so the engine's
    uniform-learning-rate ensemble (scoring.py) matches term for term.
    Higher margin = higher P(label=1): a monotone ranking score."""
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.feature import VectorAssembler

    assembled = VectorAssembler(
        inputCols=list(feature_cols), outputCol="__features"
    ).transform(
        df.select(
            *[qcol(c).cast("double").alias(c) for c in feature_cols],
            qcol(label_col).cast("double").alias("__label"),
        )
    )
    gbt = GBTClassifier(
        featuresCol="__features",
        labelCol="__label",
        maxIter=max_iter,
        maxDepth=max_depth,
        stepSize=step_size,
        seed=seed,
        subsamplingRate=subsampling_rate,
    )
    model = gbt.fit(assembled)
    weights = list(model._call_java("treeWeights"))
    trees = []
    for t, w in zip(model.trees, weights):
        root = _extract_node(t._call_java("rootNode"))
        if w != 1.0:
            root = _scale_leaves(root, w)
        trees.append(root)
    return TreeEnsembleModel(trees=tuple(trees), base=0.0, learning_rate=1.0)


def _scale_leaves(node, w: float):
    if node[0] == "leaf":
        return ("leaf", node[1] * w)
    return ("split", node[1], node[2], _scale_leaves(node[3], w), _scale_leaves(node[4], w))
