"""In-engine ALS embedding production (models.py) — lifecycle closure.

The reference trains two-tower embeddings then serves them through an ANN
index (scripts/train_movielens.py -> src/models/two_tower.py:516-546 ->
faiss). Here: interactions -> implicit ALS -> (id, embedding) -> the SAME
knn operators the static embeddings table feeds. The test drives that whole
path and compares ALS-top-k recall against the popularity baseline.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SPLIT_TS = "2024-01-16 00:00:00"


def _clicks(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from pyspark.sql import types as T

    if isinstance(ev.schema["ts"].dataType, T.LongType):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev.withColumn(
        "item_id", F.get_json_object("props", "$.k").cast("long")
    ).where(F.col("item_id").isNotNull() & (F.col("event_type") == "click"))


def test_als_embeddings_feed_knn_and_beat_or_match_noise(spark):
    from real_time_recommendation_system_with_feature_store_spark.evaluation.metrics import ranking_metrics
    from real_time_recommendation_system_with_feature_store_spark.models import train_embeddings
    from real_time_recommendation_system_with_feature_store_spark.operators.knn import brute_force_topk

    ev = _clicks(spark)
    split = F.lit(SPLIT_TS).cast("timestamp")
    train = ev.where(F.col("ts") < split)
    truth = ev.where(F.col("ts") >= split).select("user_id", "item_id").distinct()

    # one fit, both towers (the same-factorization guarantee is structural)
    user_emb, item_emb = train_embeddings(train, "user_id", "item_id", rank=8, max_iter=5)

    # shape contract: one row per training item, dense rank-8 doubles
    n_items = train.select("item_id").distinct().count()
    rows = item_emb.collect()
    assert len(rows) == n_items
    assert all(len(r["embedding"]) == 8 for r in rows)

    # the produced table feeds the SAME retrieval operator the static
    # embeddings table does
    recs = brute_force_topk(
        user_emb.withColumnRenamed("user_id", "qid"),
        item_emb,
        query_id="qid",
        item_id="item_id",
        query_vec="embedding",
        item_vec="embedding",
        k=10,
        exclude_self=False,
    ).withColumnRenamed("qid", "user_id")
    m_als = ranking_metrics(
        recs.select("user_id", "item_id", "rank"), truth, k=10,
        user="user_id", item="item_id",
    ).collect()[0]

    # popularity baseline over the same split
    from real_time_recommendation_system_with_feature_store_spark.operators.topk import global_topn_ranked

    pop = train.groupBy("item_id").agg(F.count("*").alias("c"))
    top = global_topn_ranked(pop, [F.col("c").desc(), F.col("item_id")], 10).select(
        "item_id", "rank"
    )
    users = truth.select("user_id").distinct()
    m_pop = ranking_metrics(
        users.crossJoin(F.broadcast(top)), truth, k=10,
        user="user_id", item="item_id",
    ).collect()[0]

    # synthetic uniform-ish clicks carry little signal, so no strict
    # ALS > popularity claim; the contract is: the trained embeddings
    # retrieve REAL items with NONZERO hit mass at k=10 (seeded fit —
    # deterministic; measured recall ~0.04 / hit-rate 0.2 at sf0.001, so a
    # degenerate all-zero-factor regression fails these, not just >= 0)
    assert m_als["recall_at_10"] > 0.0
    assert m_als["hit_rate_at_10"] > 0.0
    assert m_pop["recall_at_10"] >= 0.0
    assert recs.count() > 0


def test_als_accepts_column_names_needing_backticks(spark):
    """Identifier handling regression: user/item column names with dots,
    hyphens, or spaces must resolve (Column.try_cast, not f-string SQL)."""
    from real_time_recommendation_system_with_feature_store_spark.models import train_embeddings

    rows = [(u, i) for u in range(8) for i in range(6) if (u + i) % 3]
    df = spark.createDataFrame(rows, ["user id", "item-id"])
    users, items = df.columns
    u_emb, i_emb = train_embeddings(df, users, items, rank=2, max_iter=2)
    assert u_emb.columns == [users, "embedding"]
    assert i_emb.columns == [items, "embedding"]
    assert u_emb.count() == 8 and i_emb.count() == 6
