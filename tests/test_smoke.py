"""Import + basic-execution smoke tests for every module."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_imports():
    import real_time_recommendation_system_with_feature_store_spark as pkg
    from real_time_recommendation_system_with_feature_store_spark import evaluation, features, functions, operators, plans, sources, streaming  # noqa: F401

    assert pkg.__version__


def test_tables_load(tables):
    assert tables["lineitem"].count() > 0
    assert tables["events"].count() > 0
    assert set(tables["customer"].columns) >= {"c_custkey", "c_mktsegment"}


def test_scalar_functions(spark):
    from real_time_recommendation_system_with_feature_store_spark.functions import scalars

    df = spark.createDataFrame(
        [("Toy Story (1995)",), ("No Year Here",)], ["title"]
    ).select(
        scalars.extract_year(F.col("title")).alias("year"),
        scalars.strip_year(F.col("title")).alias("clean"),
    )
    rows = {r["clean"]: r["year"] for r in df.collect()}
    assert rows["Toy Story"] == 1995
    assert rows["No Year Here"] == 1990


def test_vector_functions(spark):
    from real_time_recommendation_system_with_feature_store_spark.functions import vectors

    df = spark.createDataFrame([([3.0, 4.0], [4.0, 3.0])], ["a", "b"])
    row = df.select(
        vectors.l2_norm(F.col("a")).alias("norm"),
        vectors.dot(F.col("a"), F.col("b")).alias("dot"),
        vectors.cosine(F.col("a"), F.col("b")).alias("cos"),
    ).collect()[0]
    assert abs(row["norm"] - 5.0) < 1e-9
    assert abs(row["dot"] - 24.0) < 1e-9
    assert abs(row["cos"] - 24.0 / 25.0) < 1e-9


def test_hash_unit_deterministic(spark):
    from real_time_recommendation_system_with_feature_store_spark.functions.scalars import hash_unit

    df = spark.range(100).select(hash_unit(F.lit("salt"), F.col("id")).alias("u"))
    vals1 = [r["u"] for r in df.collect()]
    vals2 = [r["u"] for r in df.repartition(7).orderBy("u").collect()]
    assert sorted(vals1) == sorted(vals2)
    assert all(0 <= v < 1 for v in vals1)


def test_json_sink_roundtrip(spark):
    """S9: metrics frame -> JSON lines -> read back."""
    import os as _os
    import shutil

    from real_time_recommendation_system_with_feature_store_spark.sources.writers import write_json

    tmp = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".tmp", "json_rt")
    shutil.rmtree(tmp, ignore_errors=True)
    df = spark.createDataFrame([("recall_at_10", 0.0136), ("mrr", 0.1524)], "metric string, value double")
    write_json(df, tmp)
    back = {(r["metric"], r["value"]) for r in spark.read.json(tmp).collect()}
    assert back == {("recall_at_10", 0.0136), ("mrr", 0.1524)}


def test_tolerant_json_decode_splits_good_and_bad(spark):
    from pyspark.sql import types as T

    from real_time_recommendation_system_with_feature_store_spark.sources.readers import read_json_events_tolerant

    rows = [
        (1, '{"event_type": "click", "user_id": 7}'),
        (2, "not json at all"),
        (3, '{"event_type": "view", "user_id": 8}'),
        (4, '{"truncated": '),
        (5, None),  # NULL payload must dead-letter, not pass as all-null row
    ]
    df = spark.createDataFrame(rows, "offset long, payload string")
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    good, bad = read_json_events_tolerant(spark, df, "payload", schema, keep=["offset"])
    assert {(r["offset"], r["event_type"], r["user_id"]) for r in good.collect()} == {
        (1, "click", 7),
        (3, "view", 8),
    }
    # rejects keep the raw payload for a dead-letter sink
    assert {r["offset"] for r in bad.collect()} == {2, 4, 5}
    assert "payload" in bad.columns
