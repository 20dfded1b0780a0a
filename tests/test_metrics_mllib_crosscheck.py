"""Independent implementation cross-check: our DataFrame ranking metrics vs
pyspark.mllib.evaluation.RankingMetrics on identical inputs (SURVEY §7.1
item 7). Catches formula drift neither a golden value nor the DuckDB
oracle (which shares our formula) would."""

from __future__ import annotations

from pyspark.mllib.evaluation import RankingMetrics
from pyspark.sql import functions as F


def test_ranking_metrics_match_mllib(spark):
    from real_time_recommendation_system_with_feature_store_spark.evaluation.metrics import ranking_metrics

    # deterministic synthetic: 40 users, ranked recs from hash arithmetic
    users = list(range(40))
    recs_rows, truth_rows, pairs = [], [], []
    for u in users:
        ranked = [(u * 7 + r * 13) % 30 for r in range(10)]
        # dedupe preserving order (ranked lists must not repeat items)
        seen, ordered = set(), []
        for it in ranked:
            if it not in seen:
                seen.add(it)
                ordered.append(it)
        truth = sorted({(u * 11 + j * 17) % 30 for j in range(5)})
        recs_rows += [(u, it, i + 1) for i, it in enumerate(ordered)]
        truth_rows += [(u, it) for it in truth]
        pairs.append((ordered, truth))

    k = 10
    recs = spark.createDataFrame(recs_rows, "user_idx int, item_idx int, rank int")
    truth = spark.createDataFrame(truth_rows, "user_idx int, item_idx int")
    row = ranking_metrics(recs, truth, k).collect()[0]

    rm = RankingMetrics(
        spark.sparkContext.parallelize([(p, t) for p, t in pairs])
    )
    assert abs(row[f"precision_at_{k}"] - rm.precisionAt(k)) < 1e-6
    assert abs(row[f"recall_at_{k}"] - rm.recallAt(k)) < 1e-6
    assert abs(row[f"ndcg_at_{k}"] - rm.ndcgAt(k)) < 1e-6
    assert abs(row[f"map_at_{k}"] - rm.meanAveragePrecisionAt(k)) < 1e-6


def test_grouped_map_metrics_match_expression_path(spark):
    """U4: the cogrouped applyInPandas per-user metric kernel macro-averages
    to exactly what the distributed rank-arithmetic path computes."""
    from real_time_recommendation_system_with_feature_store_spark.evaluation.metrics import (
        per_user_metrics_pandas,
        ranking_metrics,
    )

    recs_rows, truth_rows = [], []
    for u in range(30):
        ranked = []
        for r in range(12):
            it = (u * 5 + r * 19) % 40
            if it not in ranked:
                ranked.append(it)
        truth = sorted({(u * 13 + j * 23) % 40 for j in range(4)})
        recs_rows += [(u, it, i + 1) for i, it in enumerate(ranked)]
        truth_rows += [(u, it) for it in truth]
    k = 8
    recs = spark.createDataFrame(recs_rows, "user_idx int, item_idx int, rank int")
    truth = spark.createDataFrame(truth_rows, "user_idx int, item_idx int")

    expr_row = ranking_metrics(recs, truth, k).collect()[0]
    per_user = per_user_metrics_pandas(recs, truth, k)
    gm_row = per_user.agg(
        F.round(F.avg("recall"), 6).alias("recall"),
        F.round(F.avg("precision"), 6).alias("precision"),
        F.round(F.avg("hit"), 6).alias("hit"),
        F.round(F.avg("ndcg"), 6).alias("ndcg"),
        F.round(F.avg("rr"), 6).alias("rr"),
        F.round(F.avg("ap"), 6).alias("ap"),
    ).collect()[0]
    assert gm_row["recall"] == expr_row[f"recall_at_{k}"]
    assert gm_row["precision"] == expr_row[f"precision_at_{k}"]
    assert gm_row["hit"] == expr_row[f"hit_rate_at_{k}"]
    assert gm_row["ndcg"] == expr_row[f"ndcg_at_{k}"]
    assert gm_row["rr"] == expr_row[f"mrr_at_{k}"]
    assert gm_row["ap"] == expr_row[f"map_at_{k}"]


def test_multi_k_matches_single_k_at_every_k(spark):
    """The one-pass multi-K sweep must agree with the single-K operator at
    each K — same formulas, shared hits prefix, no drift."""
    from real_time_recommendation_system_with_feature_store_spark.evaluation.metrics import (
        ranking_metrics,
        ranking_metrics_multi_k,
    )

    recs_rows, truth_rows = [], []
    for u in range(25):
        ranked = []
        for r in range(30):
            it = (u * 3 + r * 7) % 60
            if it not in ranked:
                ranked.append(it)
        truth = sorted({(u * 13 + j * 11) % 60 for j in range(6)})
        recs_rows += [(u, it, i + 1) for i, it in enumerate(ranked)]
        truth_rows += [(u, it) for it in truth]
    recs = spark.createDataFrame(recs_rows, "user_idx int, item_idx int, rank int")
    truth = spark.createDataFrame(truth_rows, "user_idx int, item_idx int")

    ks = (5, 10, 20)
    multi = {r["k"]: r for r in ranking_metrics_multi_k(recs, truth, ks=ks).collect()}
    assert sorted(multi) == list(ks)
    for k in ks:
        single = ranking_metrics(recs, truth, k).collect()[0]
        got = multi[k]
        assert got["recall"] == single[f"recall_at_{k}"], k
        assert got["precision"] == single[f"precision_at_{k}"], k
        assert got["hit_rate"] == single[f"hit_rate_at_{k}"], k
        assert got["ndcg"] == single[f"ndcg_at_{k}"], k
        assert got["mrr"] == single[f"mrr_at_{k}"], k
        assert got["map"] == single[f"map_at_{k}"], k
