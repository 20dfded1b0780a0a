"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are backed by the catalog in
``real_time_recommendation_system_with_feature_store_spark.queries`` — each entry is an operator from SURVEY.md §2
(plus the LLM-pipeline additions) with a DuckDB-oracle SQL twin where the
semantics are SQL-expressible; approximate ops (MinHash/SimHash/LSH) are
rows-only by design, with their exact counterparts oracle-checked.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-user top-5
    popular-in-segment recommendations (SURVEY.md §7.2)."""
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    return QUERIES["segment_recommendations"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from real_time_recommendation_system_with_feature_store_spark.queries import QUERIES

    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
