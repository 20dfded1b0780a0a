"""Vector similarity search — SURVEY.md §2.3 J8 + the ANN scale tiers.

``brute_force_topk`` is the exact, oracle-checkable baseline (the reference's
own ground truth is brute-force U·Iᵀ, scripts/evaluate_model.py:218).
``lsh_topk`` and ``ivf_topk`` are the scale paths: both cut the candidate set
before exact rescoring. ``ivf_topk`` mirrors the reference's actual index
(faiss ``IVF{n},Flat`` with ``nprobe`` probing, src/serving/retrieval.py:
60-62,88-108) as DataFrame joins: cluster the catalog once, search only the
probed cells. ``cosine_near_dup_pairs`` is the embedding-space near-duplicate
detector (same join, thresholded instead of ranked).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
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


def _assign_cells(items: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: items × broadcast(centroids), keep the
    argmax-cosine cell per item (ties broken by lower cell id via the struct
    ordering; centroids are unit-norm so dot == cosine)."""
    scored = items.crossJoin(F.broadcast(centroids)).select(
        "__iid",
        "__iv",
        F.struct(
            dot(F.col("__iv"), F.col("__cv")).alias("s"),
            (-F.col("__cell")).alias("negcell"),
            F.col("__cell").alias("cell"),
        ).alias("__sc"),
    )
    return (
        scored.groupBy("__iid")
        .agg(F.max("__sc").alias("__best"), F.first("__iv").alias("__iv"))
        .select("__iid", "__iv", F.col("__best.cell").alias("__cell"))
    )


def ivf_topk(
    queries: DataFrame,
    items: DataFrame,
    query_id: str,
    item_id: str,
    query_vec: str = "embedding",
    item_vec: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    refine_iters: int = 1,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via an inverted-file (IVF) index, all
    DataFrame ops (reference: faiss IVF + nprobe, src/serving/retrieval.py:
    88-108; its training step is k-means — here ``refine_iters`` distributed
    Lloyd steps from deterministic seeds).

    Build: seed ``n_cells`` centroids from the lowest-id items (deterministic,
    no rand()), refine by mean-of-assigned (posexplode → per-dimension avg →
    re-assemble), assign each item to one cell. Search: per query score only
    the ``n_probe`` nearest cells' items — candidate volume is
    |items| · n_probe / n_cells instead of |items|.

    At cluster scale the assigned-items table is computed once, persisted,
    and partitioned by cell so each probe reads only matching partitions.
    """
    it = items.select(F.col(item_id).alias("__iid"), l2_normalize(F.col(item_vec)).alias("__iv"))
    centroids = (
        it.withColumn("__cell", F.row_number().over(Window.orderBy("__iid")))
        .where(F.col("__cell") <= n_cells)
        .select("__cell", F.col("__iv").alias("__cv"))
    )
    for _ in range(max(refine_iters, 0)):
        step = _assign_cells(it, centroids)
        centroids = (
            step.select("__cell", F.posexplode("__iv").alias("__pos", "__x"))
            .groupBy("__cell", "__pos")
            .agg(F.avg("__x").alias("__m"))
            .groupBy("__cell")
            .agg(F.array_sort(F.collect_list(F.struct("__pos", "__m"))).alias("__pm"))
            .select(
                "__cell",
                l2_normalize(F.transform(F.col("__pm"), lambda s: s["__m"])).alias("__cv"),
            )
        )
    assigned = _assign_cells(it, centroids)

    q = queries.select(F.col(query_id).alias("__qid"), l2_normalize(F.col(query_vec)).alias("__qv"))
    probes = topk_per_key(
        q.crossJoin(F.broadcast(centroids)).select(
            "__qid", "__qv", "__cell", dot(F.col("__qv"), F.col("__cv")).alias("__cs")
        ),
        ["__qid"],
        [F.col("__cs").desc(), F.col("__cell").asc()],
        n_probe,
        rank_col="__prank",
    ).select("__qid", "__qv", "__cell")

    # broadcast the probe list (|queries| × n_probe rows): a shuffle join on
    # __cell would hash-partition the whole catalog across ≤ n_cells keys —
    # guaranteed skew; broadcasting keeps the item side map-side only
    cand = assigned.join(F.broadcast(probes), "__cell")
    if exclude_self:
        cand = cand.where(F.col("__qid") != F.col("__iid"))
    scored = cand.select(
        F.col("__qid").alias(query_id),
        F.col("__iid").alias(item_id),
        F.round(dot(F.col("__qv"), F.col("__iv")), 6).alias("score"),
    )
    return topk_per_key(scored, [query_id], [F.col("score").desc(), F.col(item_id).asc()], k)


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine ≥ t).

    Exact all-pairs form (oracle-checkable); the threshold is applied to the
    6dp-ROUNDED similarity so both engines make identical boundary decisions.
    At catalog scale, run the same rescoring after an ``lsh_topk``/``ivf_topk``
    candidate cut instead of the full self-join.
    """
    a = df.select(F.col(id_col).alias("id_a"), l2_normalize(F.col(vec_col)).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), l2_normalize(F.col(vec_col)).alias("__vb"))
    return (
        b.crossJoin(F.broadcast(a))
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("__va"), F.col("__vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
