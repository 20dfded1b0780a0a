"""PySpark-native analytics engine with the query/data-processing surface of
the reference real-time recommendation system + feature store.

Everything is expressed as lazy DataFrame transformations so Catalyst can
optimize (pushdown, pruning, broadcast, AQE); custom semantics the built-in
operators lack (as-of join, cosine top-k, MinHash dedup, ...) are composed
from DataFrame primitives — Pandas UDFs only where genuinely required.

Layout:
    session      — tuned SparkSession builder
    sources      — readers/writers + schema registry (parquet, ::-csv, json, kafka)
    functions    — scalar/vector/text function library (JVM-side expressions)
    operators    — composite relational operators (asof, topk, dedup, knn, kcore, ...)
    features     — feature-engineering layer + point-in-time feature store
    streaming    — Structured Streaming pipelines (windowed features, upserts)
    evaluation   — ranking metrics as DataFrame aggregations
"""

from real_time_recommendation_system_with_feature_store_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
