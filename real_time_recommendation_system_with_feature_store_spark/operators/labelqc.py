"""Label-quality operators — the "find mislabeled examples" pass a
supervised training-data pipeline runs before spending GPU-hours on a
noisy label column (kNN-agreement label-noise detection in the spirit of
Deep k-NN, Bahri et al. 2020 / Confident Learning, Northcutt et al. 2021;
centroid-margin scoring is the cheap one-pass screen).

The reference has no supervised label-QC stage — its labels are implicit
interactions derived from the event stream (src/models/two_tower.py) — so
this extends the corpus-quality tier (SURVEY §2.11) to labeled embedding
tables. Both operators reuse the J8 similarity kernels, so the scale story
is the ANN family's: ``method="brute"`` is the exact, oracle-checkable
baseline (one item scan × broadcast query batch per ``brute_force_topk``);
``method="ivf"`` bounds the neighbor search to probed cells for the
corpus-scale path, with the voting tail unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.functions.vectors import dot, l2_normalize
from real_time_recommendation_system_with_feature_store_spark.ident import qcol


def knn_label_vote(
    df: DataFrame,
    id_col: str,
    label_col: str,
    vec_col: str = "embedding",
    k: int = 5,
    method: str = "brute",
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """kNN label vote: for each row, find its ``k`` nearest neighbors by
    cosine (excluding itself), let them vote on the label (tie-break:
    count desc, label asc — deterministic), and flag rows whose own label
    loses the vote.

    Returns ``(id_col, label_col, voted_label, n_agree, is_suspect)`` —
    ``n_agree`` counts the neighbors carrying the row's OWN label,
    ``is_suspect`` is 1 when the voted label differs. A high suspect rate
    for a class is the classic label-noise / class-overlap signal.

    Plan shape: the neighbor search is ``brute_force_topk`` (exact; the
    corpus-as-queries side routes through its plan-size gate, so an
    oversized query side falls back to the distributed plan instead of a
    driver collect) or ``ivf_topk`` (probed-cells candidate set — the
    100 TB path; same frozen-seed build as the ANN tier). The voting tail
    sees only |V|·k slim rows: one equi-join to attach neighbor labels,
    one groupBy for the vote — nothing rescans the vectors.
    """
    from real_time_recommendation_system_with_feature_store_spark.operators.knn import brute_force_topk, ivf_topk

    q = df.select(qcol(id_col).alias("__qid"), qcol(vec_col).alias("__v"))
    it = df.select(qcol(id_col).alias("__nid"), qcol(vec_col).alias("__v"))
    if method == "ivf":
        nn = ivf_topk(
            q, it, "__qid", "__nid", query_vec="__v", item_vec="__v",
            k=k, n_cells=n_cells, n_probe=n_probe,
        )
    elif method == "brute":
        nn = brute_force_topk(
            q, it, "__qid", "__nid", query_vec="__v", item_vec="__v", k=k
        )
    else:
        raise ValueError(f"knn_label_vote: unknown method {method!r}")

    nbr_labels = df.select(
        qcol(id_col).alias("__nid"), qcol(label_col).alias("__nl")
    )
    own = df.select(qcol(id_col).alias("__qid"), qcol(label_col).alias("__ol"))
    # |V|·k slim rows from here on; the (qid, own, neighbor-label) counts
    # feed BOTH the vote and the agreement tally in one aggregation pass
    votes = (
        nn.join(nbr_labels, "__nid")
        .join(own, "__qid")
        .groupBy("__qid", "__ol", "__nl")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    res = votes.groupBy("__qid", "__ol").agg(
        # (count desc, label asc) without negating the label column —
        # labels may be strings (negation would throw under ANSI mode /
        # NULL-flip the order under legacy). min over (-count, label)
        # orders identically for ANY orderable label type.
        F.min(
            F.struct(
                (-F.col("__c")).alias("negc"),
                F.col("__nl").alias("l"),
            )
        ).alias("__w"),
        F.sum(
            F.when(F.col("__nl") == F.col("__ol"), F.col("__c")).otherwise(F.lit(0))
        ).alias("n_agree"),
    )
    voted = res.select(
        F.col("__qid"),
        F.col("__w.l").alias("voted_label"),
        F.col("n_agree").cast("long").alias("n_agree"),
        F.when(F.col("__w.l") != F.col("__ol"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_suspect"),
    )
    # Rows with zero neighbors (singleton corpus; IVF probes hitting only
    # the row's own cell) still appear in the output: voted_label NULL,
    # n_agree 0, is_suspect 0 — per-class suspect-rate consumers see the
    # full population, not a silently contracted one.
    return (
        own.join(voted, "__qid", "left")
        .select(
            F.col("__qid").alias(id_col),
            F.col("__ol").alias(label_col),
            F.col("voted_label"),
            F.coalesce(F.col("n_agree"), F.lit(0)).cast("long").alias("n_agree"),
            F.coalesce(F.col("is_suspect"), F.lit(0)).cast("int").alias("is_suspect"),
        )
    )


def label_centroid_margin(
    df: DataFrame,
    id_col: str,
    label_col: str,
    vec_col: str = "embedding",
    max_labels: int = 10_000,
) -> DataFrame:
    """Centroid-margin label screen: build one unit centroid per label
    (per-dimension mean of the L2-normalized vectors, renormalized — the
    ``_lloyd_refine`` mean step keyed by label), then score every row's
    cosine to its OWN-label centroid against the best OTHER-label centroid.
    ``margin = own_cos - best_other_cos`` (6dp); a negative margin means
    the row sits closer to another class's center — the cheap one-pass
    mislabel screen that runs before the k× more expensive kNN vote.

    Returns ``(id_col, label_col, own_cos, best_other_label,
    best_other_cos, margin, is_suspect)``; ties for the best other
    centroid break on (cosine desc, label asc).

    Plan shape: one posexplode+agg pass builds the (label, dim) means, the
    centroid table is materialized (``localCheckpoint``, one tiny frame)
    and counted so a high-cardinality non-label column fails loudly at
    ``max_labels`` instead of OOM-ing the broadcast; scoring is one corpus
    scan × broadcast(centroids) with no further shuffle before the final
    per-row aggregate. At 100 TB that is one shuffle of (label, dim) cells
    plus one broadcast — no pairwise anything.
    """
    norm = df.select(
        qcol(id_col).alias("__qid"),
        qcol(label_col).alias("__l"),
        l2_normalize(qcol(vec_col)).alias("__nv"),
    )
    cents = (
        norm.select("__l", F.posexplode("__nv").alias("__pos", "__x"))
        .groupBy("__l", "__pos")
        .agg(F.avg("__x").alias("__m"))
        .groupBy("__l")
        .agg(F.array_sort(F.collect_list(F.struct("__pos", "__m"))).alias("__pm"))
        .select(
            F.col("__l").alias("__cl"),
            l2_normalize(F.transform(F.col("__pm"), lambda s: s["__m"])).alias("__cv"),
        )
    )
    # Catalyst's size estimate for an aggregate is garbage (see
    # plans.gated_broadcast), so gate the forced broadcast on the REAL
    # row count of the materialized centroid table instead.
    cents = cents.localCheckpoint(eager=True)
    n_labels = cents.count()
    if n_labels > max_labels:
        raise ValueError(
            f"label_centroid_margin: {n_labels} distinct labels exceeds "
            f"max_labels={max_labels} — is {label_col!r} really a class "
            "label column?"
        )
    scored = norm.crossJoin(F.broadcast(cents)).select(
        "__qid",
        "__l",
        "__cl",
        F.round(dot(F.col("__nv"), F.col("__cv")), 6).alias("__cos"),
    )
    res = scored.groupBy("__qid", "__l").agg(
        F.max(F.when(F.col("__cl") == F.col("__l"), F.col("__cos"))).alias("own_cos"),
        # (cosine desc, label asc) via min over (-cosine, label) — no
        # label negation, so string class labels order correctly too.
        F.min(
            F.when(
                F.col("__cl") != F.col("__l"),
                F.struct(
                    (-F.col("__cos")).alias("negc"),
                    F.col("__cl").alias("l"),
                    F.col("__cos").alias("c"),
                ),
            )
        ).alias("__b"),
    )
    margin = F.round(F.col("own_cos") - F.col("__b.c"), 6)
    return res.select(
        F.col("__qid").alias(id_col),
        F.col("__l").alias(label_col),
        "own_cos",
        F.col("__b.l").alias("best_other_label"),
        F.col("__b.c").alias("best_other_cos"),
        margin.alias("margin"),
        F.when(margin < 0, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("is_suspect"),
    )
