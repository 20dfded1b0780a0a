"""Vector math over ``array<float>`` columns (SURVEY.md §2.8 F23-F24).

All JVM-side higher-order functions (``aggregate``/``zip_with``/``transform``)
— no UDFs, so cosine scoring stays inside codegen and scales linearly with
partitions. The reference does the same math via faiss/numpy
(src/serving/retrieval.py:84-86; scripts/evaluate_model.py:218).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """F24: sum(a_i * b_i) via zip_with + aggregate (JVM, no UDF).

    Elements are widened to double BEFORE multiplying so float inputs get
    double-precision math (matches numpy/DuckDB behavior on float32 columns).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """sqrt(sum(a_i^2)), double math."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def l2_normalize(a: Column) -> Column:
    """F23: a / ||a|| (reference src/serving/retrieval.py:86 faiss.normalize_L2).

    Zero vectors pass through unchanged (norm guarded to eps).

    The guarded norm is let-bound OUTSIDE the transform: inlined, the
    ``x / safe`` lambda body re-evaluated the whole norm aggregate per
    ELEMENT (O(d^2) per vector in interpreted HOF evaluation).
    """
    from real_time_recommendation_system_with_feature_store_spark.functions.scalars import let

    norm = l2_norm(a)
    safe = F.when(norm > F.lit(0.0), norm).otherwise(F.lit(1.0))
    return let(safe, lambda s: F.transform(a, lambda x: x / s))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity without pre-normalization.

    The denominator is let-bound so the two norm aggregates run once per row
    (inlined, the guard + quotient repeated the denominator tree, doubling
    the array passes under interpreted evaluation).
    """
    from real_time_recommendation_system_with_feature_store_spark.functions.scalars import let

    return let(
        l2_norm(a) * l2_norm(b),
        lambda d: F.when(d > F.lit(0.0), dot(a, b) / d).otherwise(F.lit(0.0)),
    )


def cosine_distance(a: Column, b: Column) -> Column:
    """1 - cosine (diversity metric, reference src/evaluation/metrics.py:430-434)."""
    return F.lit(1.0) - cosine(a, b)
