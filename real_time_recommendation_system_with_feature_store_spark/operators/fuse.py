"""Reciprocal-rank fusion (RRF) of ranked candidate lists.

The reference's two-stage recommender calibrates ONE retrieval model's
scores into ONE reranker (src/models/two_tower.py retrieval →
src/models/ranking_models.py rerank); production recommenders and hybrid
search fuse SEVERAL heterogeneous generators (popularity, graph
centrality, vector ANN, lexical) whose scores are not comparable. RRF
(Cormack/Clarke/Buettcher, SIGIR 2009) is the standard score-free fusion:
each list contributes 1/(k + rank), so only rank order matters and k
damps the head. This module is the fusion step the reference lacks,
feeding the same rerankers (scoring.py / two_stage_recommendations).

Scale shape: no joins — the lists union (column-pruned to key + rank) and
one groupBy on the entity key partial-aggregates map-side, so fusing N
lists of 100 TB-derived candidates costs one slim shuffle, the same plan
at 3 lists or 30.

Determinism contract: the per-rank contribution is the INTEGER
``floor(scale / (k + rank))`` and the fused score sums those integers —
order-independent (bigint addition commutes exactly, the same move the
catalog's DECIMAL money sums make) and replayable in ANSI SQL, unlike a
double sum whose partial-aggregation order leaks into the last ulp.
``rrf_score = fused_int / scale`` is one IEEE division, identical in
every engine. NULL keys are dropped (a NULL entity identifies nothing to
recommend); rank must be 1-based and unique within a list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.ident import qcol

_RRF_INTERNAL = ("__rrf_contrib",)


def rrf_fuse(
    ranked: list[DataFrame],
    on: list[str],
    rank_col: str = "rank",
    k: int = 60,
    scale: int = 10**12,
    out_score: str = "rrf_score",
    out_lists: str = "n_lists",
    strict: bool = False,
) -> DataFrame:
    """Fuse ranked lists into ``(on..., out_score, out_lists)``.

    Each input frame must carry the ``on`` key columns plus a 1-based
    ``rank_col``; anything else is pruned before the union (column
    pruning keeps the shuffle slim). ``out_lists`` counts how many lists
    proposed the entity — a useful consensus signal for downstream
    filtering (e.g. require >= 2 generators to agree).

    Rank rows must be UNIQUE per entity within each list — a list that
    proposes the same entity twice would silently double-count its
    contribution (and inflate ``out_lists``). ``strict=True`` enforces
    that in-plan: each list gets a per-key count window and the fuse job
    fails loudly on the first duplicate instead of corrupting the fusion.
    The check adds one window (re-using the groupBy's hash partitioning)
    per list, so it is off by default for trusted upstream top-k output
    (this engine's topk_per_key emits one row per key by construction).
    """
    if not ranked:
        raise ValueError("rrf_fuse: need at least one ranked list")
    clash = set(_RRF_INTERNAL) & {c for f in ranked for c in f.columns}
    if clash:
        raise ValueError(
            f"rrf_fuse: input columns collide with reserved internal "
            f"names: {sorted(clash)}"
        )
    keys = [qcol(c) for c in on]
    contrib = F.floor(
        F.lit(float(scale)) / (F.lit(k) + qcol(rank_col).cast("double"))
    ).cast("long")
    nonnull = keys[0].isNotNull()
    for c in keys[1:]:
        nonnull = nonnull & c.isNotNull()
    if strict:
        dup = F.count("*").over(Window.partitionBy(*keys)) > 1
        contrib = F.when(
            dup,
            F.raise_error(
                F.concat(
                    F.lit("rrf_fuse: duplicate entity within one ranked "
                          "list (key "),
                    F.concat_ws(",", *[k.cast("string") for k in keys]),
                    F.lit(") — each list must propose an entity at most once"),
                )
            ).cast("long"),
        ).otherwise(contrib)
    parts = [
        f.where(nonnull).select(*keys, contrib.alias("__rrf_contrib"))
        for f in ranked
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy(*keys).agg(
        (F.sum("__rrf_contrib") / F.lit(float(scale))).alias(out_score),
        F.count("*").alias(out_lists),
    )
