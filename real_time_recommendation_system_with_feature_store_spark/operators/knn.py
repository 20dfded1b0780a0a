"""Vector similarity search — SURVEY.md §2.3 J8 + the ANN scale tier.

``brute_force_topk`` is the exact, oracle-checkable baseline (the reference's
own ground truth is brute-force U·Iᵀ, scripts/evaluate_model.py:218).
``lsh_topk`` is the scale path: sign-random-projection buckets cut the
candidate set before exact rescoring — same shape as the reference's IVF
``nprobe`` search (src/serving/retrieval.py:60-62,141-197), but expressed as
joins so it distributes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.functions.vectors import dot, l2_normalize
from real_time_recommendation_system_with_feature_store_spark.operators.topk import topk_per_key


def brute_force_topk(
    queries: DataFrame,
    items: DataFrame,
    query_id: str,
    item_id: str,
    query_vec: str = "embedding",
    item_vec: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: normalize both sides, broadcast the query side,
    dot-product score, per-query top-k.

    Plan shape: items scan (big, partition-parallel) × broadcast(queries) —
    one pass over the item table per batch of queries, no shuffle until the
    final per-query rank (which sees |Q|·k rows only after partial pruning).

    Returns (query_id, item_id, score, rank) with deterministic tie-break on
    item id. Scores rounded to 6dp for cross-engine float stability.
    """
    q = queries.select(
        F.col(query_id).alias("__qid"), l2_normalize(F.col(query_vec)).alias("__qv")
    )
    it = items.select(
        F.col(item_id).alias("__iid"), l2_normalize(F.col(item_vec)).alias("__iv")
    )
    pairs = it.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.where(F.col("__qid") != F.col("__iid"))
    scored = pairs.select(
        F.col("__qid").alias(query_id),
        F.col("__iid").alias(item_id),
        F.round(dot(F.col("__qv"), F.col("__iv")), 6).alias("score"),
    )
    return topk_per_key(
        scored, [query_id], [F.col("score").desc(), F.col(item_id).asc()], k
    )


def _sign_projection_bits(vec, dim: int, n_planes: int, salt: int = 0):
    """Deterministic pseudo-random hyperplanes: component (p,i) is derived
    from xxhash64(salt,p,i) mapped to {-1,+1}. No rand(), so buckets are
    stable across partitionings and re-runs; ``salt`` makes hash TABLES
    independent (same-prefix planes would correlate every table)."""
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x
                * F.when(
                    F.pmod(F.xxhash64(F.lit(salt), F.lit(p), i), F.lit(2)) == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).cast("string"))
    return F.concat_ws("", *bits)


def lsh_topk(
    queries: DataFrame,
    items: DataFrame,
    query_id: str,
    item_id: str,
    dim: int,
    query_vec: str = "embedding",
    item_vec: str = "embedding",
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via sign-random-projection LSH.

    ``n_tables`` independent bucketings (planes salted by table index);
    candidates = items sharing a bucket with the query in ANY table, then
    exact cosine rescoring + per-query top-k. Candidate volume scales as
    |items| / 2^n_planes per table — tune n_planes to catalog size.
    """
    def with_buckets(df, id_col, vec_col, out_id):
        norm = df.select(F.col(id_col).alias(out_id), l2_normalize(F.col(vec_col)).alias("__v"))
        buckets = F.array(
            *[
                F.concat_ws("|", F.lit(str(t)), _sign_projection_bits(F.col("__v"), dim, n_planes, salt=t))
                for t in range(n_tables)
            ]
        )
        return norm.withColumn("__bucket", F.explode(buckets))

    q = with_buckets(queries, query_id, query_vec, "__qid")
    it = with_buckets(items, item_id, item_vec, "__iid")
    cand = (
        q.join(it, "__bucket")
        .where(F.col("__qid") != F.col("__iid") if exclude_self else F.lit(True))
        .select("__qid", "__iid", q["__v"].alias("__qv"), it["__v"].alias("__iv"))
        .dropDuplicates(["__qid", "__iid"])
    )
    scored = cand.select(
        F.col("__qid").alias(query_id),
        F.col("__iid").alias(item_id),
        F.round(dot(F.col("__qv"), F.col("__iv")), 6).alias("score"),
    )
    return topk_per_key(scored, [query_id], [F.col("score").desc(), F.col(item_id).asc()], k)
