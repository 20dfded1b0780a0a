"""Declared schema registry.

Mirrors the reference's dual schema system (SURVEY.md §1.3): Feast-style
declared FeatureView schemas (reference `src/features/feature_definitions.py:45-272`)
and positional schemas for `::`-delimited loaders
(reference `src/data/movielens.py:92-142`). Spark side: explicit StructType per
named fixture — schema-on-read, never inference in the data path.
"""

from __future__ import annotations

from pyspark.sql import types as T

SCHEMAS: dict[str, T.StructType] = {
    # MovieLens-shaped fixtures (reference src/data/movielens.py:85-160)
    "ratings": T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("movie_id", T.LongType(), False),
            T.StructField("rating", T.IntegerType(), True),
            T.StructField("timestamp", T.LongType(), True),
        ]
    ),
    "users": T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("gender", T.StringType(), True),
            T.StructField("age", T.IntegerType(), True),
            T.StructField("occupation", T.IntegerType(), True),
            T.StructField("zip_code", T.StringType(), True),
        ]
    ),
    "movies": T.StructType(
        [
            T.StructField("movie_id", T.LongType(), False),
            T.StructField("title", T.StringType(), True),
            T.StructField("genres", T.StringType(), True),
        ]
    ),
    # Kafka wire event (reference src/streaming/kafka_consumer.py:88-99,197-331)
    "kafka_event": T.StructType(
        [
            T.StructField("event_type", T.StringType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("item_id", T.LongType(), True),
            T.StructField("timestamp", T.TimestampType(), True),
            T.StructField("duration", T.DoubleType(), True),
            T.StructField("category", T.StringType(), True),
            T.StructField("session_id", T.StringType(), True),
        ]
    ),
    # Embedding/vector table (reference src/serving/retrieval.py:70-139)
    "embeddings": T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        ]
    ),
    # Exploded recommendation lists (reference src/evaluation/metrics.py:248-263)
    "recommendations": T.StructType(
        [
            T.StructField("user_idx", T.LongType(), False),
            T.StructField("item_idx", T.LongType(), False),
            T.StructField("rank", T.IntegerType(), False),
            T.StructField("score", T.DoubleType(), True),
        ]
    ),
    "ground_truth": T.StructType(
        [
            T.StructField("user_idx", T.LongType(), False),
            T.StructField("item_idx", T.LongType(), False),
        ]
    ),
}


def schema_for(name: str) -> T.StructType:
    return SCHEMAS[name]
