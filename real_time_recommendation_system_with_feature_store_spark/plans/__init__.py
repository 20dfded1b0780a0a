from real_time_recommendation_system_with_feature_store_spark.plans.inspect import (
    explain_str,
    gated_broadcast,
    plan_checks,
    plan_size_bytes,
)

__all__ = ["explain_str", "gated_broadcast", "plan_checks", "plan_size_bytes"]
