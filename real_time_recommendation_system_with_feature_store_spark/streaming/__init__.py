from real_time_recommendation_system_with_feature_store_spark.streaming.pipeline import (
    decode_kafka_json,
    replay_events_stream,
    windowed_feature_stream,
)

__all__ = ["decode_kafka_json", "replay_events_stream", "windowed_feature_stream"]
