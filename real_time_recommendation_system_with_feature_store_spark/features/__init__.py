from real_time_recommendation_system_with_feature_store_spark.features.engineering import (
    item_popularity_features,
    user_activity_features,
)
from real_time_recommendation_system_with_feature_store_spark.features.store import FeatureStore, FeatureView
from real_time_recommendation_system_with_feature_store_spark.features.windows import multi_window_agg

__all__ = [
    "multi_window_agg",
    "user_activity_features",
    "item_popularity_features",
    "FeatureStore",
    "FeatureView",
]
