from real_time_recommendation_system_with_feature_store_spark.plans.inspect import explain_str, plan_checks

__all__ = ["explain_str", "plan_checks"]
