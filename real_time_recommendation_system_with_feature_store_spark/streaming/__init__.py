from real_time_recommendation_system_with_feature_store_spark.streaming.pipeline import (
    decode_kafka_json,
    replay_events_stream,
    session_feature_stream,
    windowed_feature_stream,
)

from real_time_recommendation_system_with_feature_store_spark.streaming.stateful import session_depth_batch, session_depth_stream

__all__ = [
    "decode_kafka_json",
    "replay_events_stream",
    "session_feature_stream",
    "windowed_feature_stream",
    "session_depth_batch",
    "session_depth_stream",
]
