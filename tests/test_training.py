"""In-engine ranking-model training (training.py) — the reference's
fit→predict lifecycle (src/models/ranking_models.py:388-399) re-expressed
Spark-first: exact distributed normal equations for the linear ranker,
Spark ML GBT for the tree ranker, both landing in the engine's own
scoring artifacts (scoring.py)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.training import (
    fit_gbt_reranker,
    fit_linear_regression,
)


def _u01(*parts):
    h = hashlib.md5("\x1f".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:8], 16) / 16**8


def test_linear_regression_matches_lstsq(spark):
    """The distributed normal-equations fit must agree with numpy's least
    squares on the same data (exact OLS, not an approximation)."""
    # noise rounded to 2dp: every product then has <= 6 decimals, exact
    # under the Gram decimal(28,6) cast, so the fit IS full-precision OLS
    rows = [
        (
            i,
            2.0 + 0.5 * i + 3.0 * ((i * 7) % 5) + round(_u01("n", i) - 0.5, 2),
            float((i * 7) % 5),
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(
        [(float(i), y, x2) for i, y, x2 in rows], "x1 double, y double, x2 double"
    )
    m = fit_linear_regression(df, ["x1", "x2"], "y")
    X = np.column_stack([np.ones(len(rows)), [r[0] for r in rows], [r[2] for r in rows]])
    yv = np.array([r[1] for r in rows])
    want = np.linalg.lstsq(X, yv, rcond=None)[0]
    got = np.array([m.bias, *m.weights])
    assert np.allclose(got, want, rtol=1e-9), (got, want)


def test_linear_regression_partition_invariant(spark):
    """Decimal-exact Gram sums make the trained weights BIT-identical under
    any partitioning — the property the oracle-checkable contract rests on
    (float sums would drift with partition count)."""
    df = spark.range(500).select(
        F.col("id").cast("double").alias("x1"),
        (F.col("id") % 7).cast("double").alias("x2"),
        (F.col("id") * 1.25 + (F.col("id") % 7) * 3.5 + 2.0).alias("y"),
    )
    m1 = fit_linear_regression(df.coalesce(1), ["x1", "x2"], "y")
    m2 = fit_linear_regression(df.repartition(13), ["x1", "x2"], "y")
    assert (m1.bias, m1.weights) == (m2.bias, m2.weights)


def test_linear_regression_rejects_degenerate(spark):
    df = spark.range(10).select(
        F.col("id").cast("double").alias("x1"),
        (F.col("id") * 2).cast("double").alias("x2"),  # collinear
        F.col("id").cast("double").alias("y"),
    )
    with pytest.raises(ValueError):
        fit_linear_regression(df, ["x1", "x2"], "y")
    with pytest.raises(ValueError):
        fit_linear_regression(df.where(F.lit(False)), ["x1"], "y")


def test_linear_regression_hostile_names(spark):
    df = spark.range(50).select(
        F.col("id").cast("double").alias("f.x"),
        (F.col("id") * 3 + 1).cast("double").alias("the y"),
    )
    m = fit_linear_regression(df, ["f.x"], "the y")
    assert abs(m.weights[0] - 3.0) < 1e-9 and abs(m.bias - 1.0) < 1e-9


def test_gbt_extracted_model_matches_java_margin(spark):
    """The pure-Python TreeEnsembleModel extracted from the fitted java
    trees must reproduce the java model's raw margin — same trees, same
    weights, so scoring can leave the JVM without changing a single rank."""
    from pyspark.ml.feature import VectorAssembler

    rows = [
        (float(i % 10), _u01("f2", i) * 4.0, int((i % 10 > 4) != (_u01("f2", i) > 0.5)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "f1 double, f2 double, label int")
    model = fit_gbt_reranker(df, ["f1", "f2"], "label", max_iter=8, max_depth=3, seed=7)

    # rebuild the SAME java model fit to read its rawPrediction
    from pyspark.ml.classification import GBTClassifier

    assembled = VectorAssembler(inputCols=["f1", "f2"], outputCol="__features").transform(
        df.withColumn("__label", F.col("label").cast("double"))
    )
    jmodel = GBTClassifier(
        featuresCol="__features", labelCol="__label", maxIter=8, maxDepth=3,
        stepSize=0.1, seed=7,
    ).fit(assembled)
    pdf = (
        jmodel.transform(assembled)
        .select("f1", "f2", "rawPrediction")
        .limit(100)
        .toPandas()
    )
    X = pdf[["f1", "f2"]].to_numpy(dtype="float64")
    got = model.predict(X)
    want = np.array([v[1] for v in pdf["rawPrediction"]])  # [-margin, margin]
    assert np.allclose(got, want, rtol=1e-9, atol=1e-12), np.abs(got - want).max()


@pytest.mark.e2e
def test_trained_reranker_beats_unranked_candidates(spark):
    """E2E: a GBT re-ranker TRAINED in-engine on a nonlinear relevance
    signal must beat (a) the unranked retrieval ordering and (b) a trained
    LINEAR ranker on the same features (the signal is XOR-shaped, invisible
    to a linear model) — precision@5 over held-out users, the reference's
    retrieve→rerank contract (service.py two-stage + ranking_models fit)."""
    users, cands = 120, 24
    rows = []
    for u in range(users):
        for c in range(cands):
            f1 = _u01("f1", u, c)
            f2 = _u01("f2", u, c)
            rel = int((f1 > 0.5) != (f2 > 0.5))  # XOR: nonlinear
            retrieval_rank = c + 1  # candidate-generation order: no signal
            rows.append((u, c, f1, f2, rel, retrieval_rank))
    df = spark.createDataFrame(
        rows, "user int, item int, f1 double, f2 double, rel int, retrieval_rank int"
    )
    train = df.where(F.col("user") % 3 != 0)
    test = df.where(F.col("user") % 3 == 0).persist()

    def precision_at_5(ranked):
        top = ranked.where(F.col("rank") <= 5)
        per_user = top.groupBy("user").agg(F.avg("rel").alias("p"))
        return per_user.agg(F.avg("p")).collect()[0][0]

    base = test.withColumn("rank", F.col("retrieval_rank"))
    hit_base = precision_at_5(base)

    gbt = fit_gbt_reranker(train, ["f1", "f2"], "rel", max_iter=15, max_depth=3, seed=11)
    lin = fit_linear_regression(
        train, ["f1", "f2"], "rel"
    )

    from real_time_recommendation_system_with_feature_store_spark.scoring import batch_scorer

    def rerank(model):
        scorer = batch_scorer(spark, model, ["f1", "f2"])
        w = Window.partitionBy("user").orderBy(F.col("score").desc(), F.col("item"))
        return test.withColumn("score", scorer(test)).withColumn(
            "rank", F.row_number().over(w)
        )

    hit_gbt = precision_at_5(rerank(gbt))
    hit_lin = precision_at_5(rerank(lin))
    # XOR relevance: trained trees find it, linear and retrieval order can't
    assert hit_gbt > hit_base + 0.2 and hit_gbt > hit_lin + 0.2, (
        hit_gbt,
        hit_base,
        hit_lin,
    )
    assert hit_gbt > 0.9, hit_gbt
    test.unpersist()
