from real_time_recommendation_system_with_feature_store_spark.evaluation import drift
from real_time_recommendation_system_with_feature_store_spark.evaluation.metrics import (
    coverage,
    diversity_at_k,
    novelty,
    ranking_auc,
    ranking_correlation,
    ranking_metrics,
    ranking_metrics_multi_k,
)

__all__ = [
    "ranking_metrics",
    "ranking_metrics_multi_k",
    "ranking_correlation",
    "ranking_auc",
    "coverage",
    "novelty",
    "diversity_at_k",
    "drift",
]
