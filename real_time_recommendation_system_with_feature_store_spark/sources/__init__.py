from real_time_recommendation_system_with_feature_store_spark.sources.readers import (
    read_delimited,
    read_json_events,
    read_parquet,
)
from real_time_recommendation_system_with_feature_store_spark.sources.layout import (
    compact_to_target_size,
    morton_code,
    write_zordered,
)
from real_time_recommendation_system_with_feature_store_spark.sources.schemas import SCHEMAS, schema_for
from real_time_recommendation_system_with_feature_store_spark.sources.writers import write_json, write_parquet

__all__ = [
    "read_delimited",
    "read_json_events",
    "read_parquet",
    "SCHEMAS",
    "schema_for",
    "write_parquet",
    "write_json",
    "compact_to_target_size",
    "morton_code",
    "write_zordered",
]
