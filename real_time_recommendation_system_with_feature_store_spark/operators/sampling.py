"""Deterministic sampling — SURVEY.md §2.7 SE1, §2.8 F25.

``rand(seed)`` in Spark is partition-order dependent, so every sampler here
derives pseudo-randomness from md5 of the row key (SURVEY.md §4.3): stable
under any partitioning/AQE re-plan AND expressible in the ANSI-SQL oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.functions.scalars import hash_unit


def hash_key(salt: str, *cols) -> F.Column:
    """md5 hex string of salt + key columns — a portable, deterministic
    pseudo-random SORT key (hex lexicographic order == numeric order)."""
    return F.md5(F.concat_ws("\x1f", F.lit(salt), *[c.cast("string") for c in cols]))


def hash_sample(df: DataFrame, keys: Sequence[str], fraction: float, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows chosen by key hash (deterministic)."""
    u = hash_unit(F.lit(salt), *[F.col(k) for k in keys])
    return df.where(u < F.lit(fraction))


def build_item_index(
    items: DataFrame, item_col: str, small_input_bytes: int = 64 << 20
) -> DataFrame:
    """Dense 0..N-1 item index for ``negative_sample`` — the only
    catalog-sized step of the sampler.

    Cost-gated like kcore_filter: below the plan-size threshold the distinct
    catalog ranks in ONE intentionally-single-task window (constant
    partition key — the frame is the distinct item list, and the range
    machinery costs more than it saves); above it, ``global_row_number``
    range-partitions the sort. Both produce identical indexes. At a
    1e9-item catalog compute this ONCE, persist it as a dimension table,
    and pass it to every ``negative_sample`` call via ``item_index=``."""
    distinct_items = items.select(item_col).distinct()
    from real_time_recommendation_system_with_feature_store_spark.operators.kcore import _plan_size_bytes
    from real_time_recommendation_system_with_feature_store_spark.operators.rank import global_row_number

    if _plan_size_bytes(items.select(item_col)) <= small_input_bytes:
        # partitionBy(lit(1)) does NOT survive optimization — Catalyst prunes
        # foldable partition keys, leaving the bare single-partition window
        # (and its WindowExec warning). spark_partition_id() is non-foldable
        # and constant 0 after repartition(1), so the one-task sort stays
        # declared-intentional. repartition (not coalesce: coalesce would
        # collapse the distinct aggregation itself to one task) reproduces
        # exactly the Exchange SinglePartition a bare global window inserts.
        w = Window.partitionBy(F.spark_partition_id()).orderBy(F.col(item_col).asc())
        return distinct_items.repartition(1).select(
            F.col(item_col), (F.row_number().over(w) - 1).alias("__i")
        )
    return global_row_number(
        distinct_items, [F.col(item_col).asc()], rank_col="__rn"
    ).select(F.col(item_col), (F.col("__rn") - 1).alias("__i"))


def negative_sample(
    interactions: DataFrame,
    items: DataFrame,
    user_col: str,
    item_col: str,
    n_per_user: int,
    salt: str = "neg",
    oversample: int = 4,
    item_index: DataFrame | None = None,
    n_items: int | None = None,
    heavy_user_factor_cap: int = 64,
    reuse_pos: bool = True,
) -> DataFrame:
    """SE1: per-user negatives by hash-bucketed rejection sampling,
    deterministic and never materializing the |users|×|items| grid.

    Reference semantics: set difference + np.random.choice
    (src/data/movielens.py:488-512). Each user draws candidate indices —
    draw ``t`` maps to item index ``floor(hash_unit(salt, user, t) *
    |items|)`` — duplicates collapse to their first draw, draws that hit a
    positive are rejected (anti join), survivors rank by draw order and the
    first ``n_per_user`` win.

    Draw budget: the base is ``oversample * n_per_user`` per user. Users
    whose positives exceed HALF the catalog would reject most draws, so
    their budget scales by ``ceil(N/(N-p)) * oversample`` (capped at
    ``heavy_user_factor_cap``) — extra draws EXTEND the base sequence
    (higher ``t``), so light users' output is bit-identical to the fixed
    budget and a heavy user's first picks never change when the budget
    grows. A user with every item positive draws nothing.

    Scale: work is O(|users| · k·n) rows, independent of catalog size — the
    draw frame is narrow, the item-index join keys on a dense bigint (AQE
    broadcasts the index when small), and the positives anti join shuffles
    on the natural (user, item) key. The only catalog-sized step is building
    the dense item index; pass ``item_index=build_item_index(...)`` (and
    ``n_items``) to amortize it across calls at 1e9 items.
    """
    base_draws = oversample * n_per_user
    idx = item_index if item_index is not None else build_item_index(items, item_col)
    # Both idx and pos are consumed more than once (idx: the n_items count
    # + the draw join + the pos semi join; pos: the budget count + the
    # rejection anti join), and Spark plans are trees — each reference
    # would re-run the whole distinct/rank subtree. Materialize each ONCE
    # with a lazy localCheckpoint: idx is catalog-dimension-sized (and at
    # 1e9 items callers pass a persisted ``item_index`` anyway, skipping
    # this), pos is distinct-pair-sized and already costs a full dedup
    # shuffle — reading the stored copy back beats re-shuffling the base
    # interactions a second time at any scale. Trade: lineage is cut, so
    # executor loss mid-job fails the job irrecoverably (caller resubmits;
    # nothing replays automatically — see queries._reuse). pos is the
    # LARGEST frame this job holds (distinct (user, item) pairs); at the
    # 100 TB end, where a deserialized executor-memory copy of it would
    # pressure caches and a single executor loss is likely, pass
    # ``reuse_pos=False`` and the pair frame stays a lazy subtree (the two
    # consumers re-aggregate — the pre-r15 shape) or write it to a table
    # first — the same escape hatch ``item_index=`` provides for idx.
    if item_index is None:
        idx = idx.localCheckpoint(eager=False)
    if n_items is None:
        n_items = idx.count()
    # only positives IN the catalog can reject a draw — count those for the
    # budget (a user with 30 positives of which 5 are catalog items must
    # budget against p=5, not p=30, or they'd get zero/undersized draws) and
    # anti-join against them (out-of-catalog positives never match a draw)
    pos = (
        interactions.select(user_col, item_col)
        .distinct()
        .join(idx.select(item_col), item_col, "left_semi")
    )
    if reuse_pos:
        pos = pos.localCheckpoint(eager=False)
    # every interacting user draws — including one whose positives are ALL
    # out-of-catalog (p = 0, full base budget), who must not vanish
    pcount = (
        interactions.select(user_col)
        .distinct()
        .join(pos.groupBy(user_col).agg(F.count("*").alias("__p")), user_col, "left")
        .withColumn("__p", F.coalesce(F.col("__p"), F.lit(0)))
    )
    # per-user draw budget (pure expression over the tiny per-user count row)
    comp = F.lit(n_items) - F.col("__p")
    factor = F.least(
        F.lit(heavy_user_factor_cap),
        F.ceil(F.lit(n_items) / comp) * F.lit(oversample),
    )
    d = (
        F.when(comp <= 0, F.lit(0))
        .when(F.col("__p") * 2 <= F.lit(n_items), F.lit(base_draws))
        .otherwise(F.lit(base_draws) * factor)
    )
    users = pcount.select(F.col(user_col), d.cast("int").alias("__d"))
    # sequence(0, -1) would count DOWN (implicit -1 step); emit an empty
    # array for zero-budget users so explode drops them instead
    seq = F.when(
        F.col("__d") > 0, F.sequence(F.lit(0), F.col("__d") - 1)
    ).otherwise(F.array().cast("array<int>"))
    draws = users.select(F.col(user_col), F.explode(seq).alias("__t"))
    u = hash_unit(F.lit(salt), F.col(user_col), F.col("__t"))
    draws = draws.withColumn("__i", F.floor(u * F.lit(float(n_items))).cast("long"))
    cand = (
        draws.join(idx, "__i")
        .join(pos, [user_col, item_col], "left_anti")
        .groupBy(user_col, item_col)
        .agg(F.min("__t").alias("__t"))
    )
    w = Window.partitionBy(user_col).orderBy(F.col("__t").asc(), F.col(item_col).asc())
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_user)
        .select(user_col, item_col)
    )


def weighted_sample(
    df: DataFrame,
    keys: Sequence[str],
    weight,
    n: int,
    salt: str = "ws",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each row draws a deterministic uniform u from md5(salt, keys) and the
    top ``n`` rows by ``ln(u)/weight`` (desc) form the sample — inclusion
    probability proportional to weight, no replacement, and the result is
    replayable under any partitioning (rand(seed) is not).

    Scale: the selection key is a pure expression, so the global top-n
    compiles to TakeOrderedAndProject — per-partition partial top-n, no
    global sort, no shuffle of non-winners. The training-data use: corpus
    downsampling weighted by a quality/length score.
    """
    from real_time_recommendation_system_with_feature_store_spark.functions.scalars import hash_unit

    u = hash_unit(F.lit(salt), *[F.col(k) for k in keys])
    key = F.log(u) / weight
    tiebreaks = [F.col(k).asc() for k in keys]
    return (
        df.withColumn("__es", key)
        .orderBy(F.col("__es").desc(), *tiebreaks)
        .limit(n)
        .drop("__es")
    )


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    per_cell: int = 10,
    n_cells: int = 16,
    refine_iters: int = 1,
    salt: str = "cbal",
) -> DataFrame:
    """Diversity-preserving corpus subsample over an embedding column:
    cluster the space into IVF cells (the deterministic ``ivf_topk``
    build — lowest-id seeds + Lloyd steps) and keep ``per_cell`` rows per
    cell, chosen by the md5-of-key uniform (seeded, partition-independent,
    SQL-replayable). Cluster-balanced selection is the pretraining-data
    answer to head-heavy corpora: a dominant mode cannot crowd rare
    regions of embedding space out of the sample, unlike a global uniform
    draw. Returns ``(id_col, cell, rank)``.

    Scale shape: the cell build is the shared frozen-quantizer path
    (broadcast centroids × one corpus scan); ranking is one window over
    (cell, hash) — each cell's heap holds ``per_cell`` rows. Nothing is
    pairwise. Reference analog: the reference samples uniformly at
    dataloader time (src/data/movielens.py negative sampling); this is
    the embedding-aware stratification it lacks.
    """
    from real_time_recommendation_system_with_feature_store_spark.functions.scalars import hash_unit
    from real_time_recommendation_system_with_feature_store_spark.functions.vectors import l2_normalize
    from real_time_recommendation_system_with_feature_store_spark.ident import qcol
    from real_time_recommendation_system_with_feature_store_spark.operators.knn import (
        _assign_cells,
        ivf_build_centroids,
    )
    from real_time_recommendation_system_with_feature_store_spark.operators.topk import topk_per_key

    it = df.select(
        qcol(id_col).alias("__iid"), l2_normalize(qcol(vec_col)).alias("__iv")
    )
    cents = ivf_build_centroids(df, id_col, vec_col, n_cells, refine_iters)
    assigned = _assign_cells(it, cents)
    ranked = assigned.select(
        F.col("__iid").alias(id_col),
        F.col("__cell").alias("cell"),
        hash_unit(F.lit(salt), F.col("__iid")).alias("__u"),
    )
    return topk_per_key(
        ranked, ["cell"], [F.col("__u").asc(), qcol(id_col).asc()], per_cell
    ).drop("__u")
