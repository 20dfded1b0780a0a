from real_time_recommendation_system_with_feature_store_spark.functions import scalars, text, vectors

__all__ = ["scalars", "text", "vectors"]
