from real_time_recommendation_system_with_feature_store_spark.evaluation.metrics import (
    coverage,
    diversity_at_k,
    novelty,
    ranking_metrics,
)

__all__ = ["ranking_metrics", "coverage", "novelty", "diversity_at_k"]
