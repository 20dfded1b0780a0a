"""Ranking-metric suite as DataFrame aggregations — SURVEY.md §2.5 W3,
§2.4 A9-A11, §2.7 SE2, §2.3 J9/J10.

The reference computes per-user python loops over ranked lists
(src/evaluation/metrics.py:248-319); here each metric is rank arithmetic on
the exploded `(user, item, rank)` form — joins + windows, fully distributed,
no per-user collect.

Inputs:
  recs:  (user, item, rank)  rank 1-based, dense per user
  truth: (user, item)        positive ground truth

All metrics are macro-averaged over users that have >=1 truth row, matching
the reference (metrics.py:274-299 skips users without ground truth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hits(recs: DataFrame, truth: DataFrame, k: int, user: str, item: str) -> DataFrame:
    """J9/SE2: per-user hit rows within top-k: (user, rank)."""
    return recs.where(F.col("rank") <= k).join(truth, [user, item], "inner")


def ranking_metrics(
    recs: DataFrame,
    truth: DataFrame,
    k: int,
    user: str = "user_idx",
    item: str = "item_idx",
) -> DataFrame:
    """recall@k, precision@k, hit_rate@k, ndcg@k, mrr@k, map@k in ONE pass.

    Shape: hits join → per-user aggregates → global means. Two shuffles
    (join on (user,item), agg on user); both partial-aggregated map-side.

    NDCG uses the reference's binary-relevance form (metrics.py:144-157):
    DCG = Σ 1/log2(rank+1) over hits, IDCG = Σ_{i=1..min(|truth|,k)} 1/log2(i+1).
    MAP's AP normalizes by min(|truth|, k) (metrics.py:220-228).
    """
    truth_sizes = truth.groupBy(user).agg(F.count("*").alias("__n_truth"))
    hits = _hits(recs, truth, k, user, item)

    # prefix-precision at each hit: (# hits with rank <= this rank) / rank
    from pyspark.sql import Window

    w = Window.partitionBy(user).orderBy("rank")
    hits = hits.withColumn("__hit_idx", F.row_number().over(w)).withColumn(
        "__prec_at_hit", F.col("__hit_idx") / F.col("rank")
    )
    per_user_hits = hits.groupBy(user).agg(
        F.count("*").alias("__n_hits"),
        F.sum(F.lit(1.0) / F.log2(F.col("rank") + 1)).alias("__dcg"),
        F.max(F.lit(1.0) / F.col("rank")).alias("__rr"),
        F.sum("__prec_at_hit").alias("__ap_num"),
    )

    per_user = (
        truth_sizes.join(per_user_hits, user, "left")
        .na.fill({"__n_hits": 0, "__dcg": 0.0, "__rr": 0.0, "__ap_num": 0.0})
        .withColumn("__ideal_n", F.least(F.col("__n_truth"), F.lit(k)))
    )
    # IDCG = Σ_{i=1..ideal_n} 1/log2(i+1) — closed-form via sequence+aggregate
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.col("__ideal_n")),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1),
    )
    per_user = per_user.withColumn("__idcg", idcg)

    return per_user.agg(
        F.round(F.avg(F.col("__n_hits") / F.col("__n_truth")), 6).alias(f"recall_at_{k}"),
        F.round(F.avg(F.col("__n_hits") / F.lit(float(k))), 6).alias(f"precision_at_{k}"),
        F.round(F.avg(F.when(F.col("__n_hits") > 0, 1.0).otherwise(0.0)), 6).alias(f"hit_rate_at_{k}"),
        F.round(F.avg(F.col("__dcg") / F.col("__idcg")), 6).alias(f"ndcg_at_{k}"),
        F.round(F.avg("__rr"), 6).alias(f"mrr_at_{k}"),
        F.round(F.avg(F.col("__ap_num") / F.col("__ideal_n")), 6).alias(f"map_at_{k}"),
    )


def ranking_metrics_multi_k(
    recs: DataFrame,
    truth: DataFrame,
    ks: tuple[int, ...] = (5, 10, 20, 50, 100),
    user: str = "user_idx",
    item: str = "item_idx",
) -> DataFrame:
    """The reference's multi-K evaluation sweep — Recall/Precision/HitRate/
    NDCG/MRR/MAP at every K ∈ ``ks`` — in ONE pass over one hits frame
    (scripts/evaluate_model.py:254, results/EVALUATION_REPORT.md:99-104 run
    K ∈ {5,10,20,50,100} per model).

    Shape: hits computed once at max(ks) (hit indexes assigned by rank, so
    each smaller K's hit list is a PREFIX — per-K aggregates are conditional
    sums over the same rows). The recs-sized work — the truth join and the
    per-user hit window — happens ONCE; the per-K explode multiplies only
    hit rows (≤ max K per user) by |ks| and every downstream shuffle is on
    already-aggregated per-user/per-K rows, partial-aggregated map-side. A
    per-K loop would instead re-join and re-shuffle the full recs frame
    |ks| times.

    Returns long form, one row per K:
    (k, recall, precision, hit_rate, ndcg, mrr, map).
    """
    from pyspark.sql import Window

    kmax = max(ks)
    ks_arr = F.array(*[F.lit(int(k)) for k in sorted(ks)])
    truth_sizes = truth.groupBy(user).agg(F.count("*").alias("__n_truth"))

    hits = _hits(recs, truth, kmax, user, item)
    w = Window.partitionBy(user).orderBy("rank")
    hits = hits.withColumn("__hit_idx", F.row_number().over(w))
    hk = hits.select(
        user, "rank", "__hit_idx", F.explode(ks_arr).alias("k")
    ).where(F.col("rank") <= F.col("k"))
    per_user_hits = hk.groupBy(user, "k").agg(
        F.count("*").alias("__n_hits"),
        F.sum(F.lit(1.0) / F.log2(F.col("rank") + 1)).alias("__dcg"),
        F.max(F.lit(1.0) / F.col("rank")).alias("__rr"),
        F.sum(F.col("__hit_idx") / F.col("rank")).alias("__ap_num"),
    )

    base = truth_sizes.select(user, "__n_truth", F.explode(ks_arr).alias("k"))
    per_user = (
        base.join(per_user_hits, [user, "k"], "left")
        .na.fill({"__n_hits": 0, "__dcg": 0.0, "__rr": 0.0, "__ap_num": 0.0})
        .withColumn("__ideal_n", F.least(F.col("__n_truth"), F.col("k")))
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.col("__ideal_n")),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1),
    )
    per_user = per_user.withColumn("__idcg", idcg)

    return per_user.groupBy("k").agg(
        F.round(F.avg(F.col("__n_hits") / F.col("__n_truth")), 6).alias("recall"),
        F.round(F.avg(F.col("__n_hits") / F.col("k")), 6).alias("precision"),
        F.round(F.avg(F.when(F.col("__n_hits") > 0, 1.0).otherwise(0.0)), 6).alias("hit_rate"),
        F.round(F.avg(F.col("__dcg") / F.col("__idcg")), 6).alias("ndcg"),
        F.round(F.avg("__rr"), 6).alias("mrr"),
        F.round(F.avg(F.col("__ap_num") / F.col("__ideal_n")), 6).alias("map"),
    )


def coverage(recs: DataFrame, catalog: DataFrame, k: int, item: str = "item_idx") -> DataFrame:
    """A11: distinct recommended items within top-k / catalog size
    (reference metrics.py:271-317)."""
    n_rec = recs.where(F.col("rank") <= k).select(item).distinct().count()
    n_cat = catalog.select(item).distinct().count()
    spark = recs.sparkSession
    return spark.createDataFrame([(n_rec, n_cat, round(n_rec / n_cat, 6))], ["n_recommended", "n_catalog", "coverage"])


def novelty(
    recs: DataFrame,
    interactions: DataFrame,
    k: int,
    user: str = "user_idx",
    item: str = "item_idx",
) -> DataFrame:
    """J10: mean self-information -log2(pop_item / n_users) over rec slots
    (reference metrics.py:467-477)."""
    n_users = interactions.select(user).distinct().count()
    pop = interactions.groupBy(item).agg(F.count_distinct(user).alias("__pop"))
    # pop is item-catalog-sized (data-dependent): stats-gate the hint so
    # an oversized catalog shuffles instead of OOMing the executors
    from real_time_recommendation_system_with_feature_store_spark.plans.inspect import gated_broadcast

    return (
        recs.where(F.col("rank") <= k)
        .join(gated_broadcast(pop), item, "inner")
        .agg(F.round(F.avg(-F.log2(F.col("__pop") / F.lit(float(n_users)))), 6).alias(f"novelty_at_{k}"))
    )


def diversity_at_k(
    recs: DataFrame,
    embeddings: DataFrame,
    k: int,
    user: str = "user_idx",
    item: str = "item_idx",
    vec: str = "embedding",
) -> DataFrame:
    """W5: mean pairwise (1 - cosine) within each user's top-k
    (reference metrics.py:402-446). Self-join of exploded recs on user with
    i<j; pair count per user is k(k-1)/2 — bounded, so the join is cheap."""
    from real_time_recommendation_system_with_feature_store_spark.functions.vectors import cosine_distance

    r = recs.where(F.col("rank") <= k).join(embeddings, item).select(
        F.col(user), F.col(item), F.col("rank"), F.col(vec)
    )
    a = r.select(F.col(user), F.col("rank").alias("__ra"), F.col(vec).alias("__va"))
    b = r.select(F.col(user), F.col("rank").alias("__rb"), F.col(vec).alias("__vb"))
    pairs = a.join(b, user).where(F.col("__ra") < F.col("__rb"))
    per_user = pairs.groupBy(user).agg(
        F.avg(cosine_distance(F.col("__va"), F.col("__vb"))).alias("__div")
    )
    return per_user.agg(F.round(F.avg("__div"), 6).alias(f"diversity_at_{k}"))


def per_user_metrics_pandas(
    recs: DataFrame,
    truth: DataFrame,
    k: int,
    user: str = "user_idx",
    item: str = "item_idx",
) -> DataFrame:
    """U4 grouped-map twin of ``ranking_metrics``: the reference's per-user
    metric loop (src/evaluation/metrics.py:274-299) expressed as a cogrouped
    ``applyInPandas`` kernel — one pandas frame per user, numpy arithmetic
    inside, rows stay distributed.

    The expression form above is the production path (no Python in the data
    path); this twin (a) documents the grouped-map UDF surface the reference's
    free-form python maps onto, and (b) cross-checks the rank arithmetic —
    tests assert the macro-averages agree to 1e-9.

    Returns per-user rows (user, recall, precision, hit, ndcg, rr, ap) over
    users with >=1 truth row.
    """
    import numpy as np
    import pandas as pd

    user_type = truth.schema[user].dataType.simpleString()
    schema = (
        f"{user} {user_type}, recall double, precision double, hit double, "
        "ndcg double, rr double, ap double"
    )

    def fn(key, rpdf: pd.DataFrame, tpdf: pd.DataFrame) -> pd.DataFrame:
        if len(tpdf) == 0:  # reference skips users without ground truth
            return pd.DataFrame(columns=[user, "recall", "precision", "hit", "ndcg", "rr", "ap"])
        tset = set(tpdf[item])
        n_truth = len(tset)
        top = rpdf[rpdf["rank"] <= k].sort_values("rank")
        ranks = top["rank"].to_numpy(dtype=np.float64)
        hits_mask = top[item].isin(tset).to_numpy()
        hit_ranks = ranks[hits_mask]
        n_hits = int(hits_mask.sum())
        ideal = min(n_truth, k)
        idcg = float((1.0 / np.log2(np.arange(1, ideal + 1) + 1)).sum())
        dcg = float((1.0 / np.log2(hit_ranks + 1)).sum())
        rr = float((1.0 / hit_ranks).max()) if n_hits else 0.0
        ap = float((np.arange(1, n_hits + 1) / hit_ranks).sum() / ideal)
        return pd.DataFrame(
            [
                {
                    user: key[0],
                    "recall": n_hits / n_truth,
                    "precision": n_hits / float(k),
                    "hit": 1.0 if n_hits else 0.0,
                    "ndcg": dcg / idcg,
                    "rr": rr,
                    "ap": ap,
                }
            ]
        )

    return (
        recs.groupBy(user)
        .cogroup(truth.groupBy(user))
        .applyInPandas(fn, schema)
    )


def ranking_correlation(
    scored: DataFrame,
    user: str = "user_idx",
    item: str = "item_idx",
    pred: str = "pred_score",
    true: str = "true_score",
    min_items: int = 3,
    max_items: int = 10_000,
) -> DataFrame:
    """Per-user Spearman and Kendall tau-b rank correlation between a
    predicted score and the ground-truth score — the reference's
    ``evaluate_ranking_correlation`` (src/evaluation/metrics.py:481-527:
    scipy ``spearmanr``/``kendalltau`` inside a per-user python loop,
    users with fewer than ``min_items`` common items skipped, NaN
    coefficients skipped from the average), re-expressed as DataFrame
    aggregations.

    * **Spearman** = Pearson on AVERAGE ranks (scipy's tie handling):
      avg rank = min-rank + (ties-1)/2 via two windows sharing the
      per-user partitioning, then the per-user Pearson from one
      aggregation of (n, Σx, Σy, Σx², Σy², Σxy). Zero variance on
      either side (all-tied scores) yields NULL — the NaN the reference
      skips.
    * **Kendall tau-b** (scipy's default, tie-adjusted):
      (C − D)/√((n0 − n1)(n0 − n2)) with C/D counted from the i<j
      pairwise self-join WITHIN each user (the same per-user-bounded
      pair cost class as ``diversity_at_k``; never cross-user) and the
      tie terms n1/n2 from per-(user, score) group counts. A zero
      denominator yields NULL.

    Input contract (enforced loudly, not silently diverged from):
    ``(user, item)`` must be UNIQUE — duplicate rows would be excluded
    from Kendall's C/D pair join (the ``__ia < __ib`` filter drops
    equal-id pairs) while still inflating Spearman's n and the tie
    terms, a silent divergence from scipy on the same lists — so
    duplicates raise ``ValueError``; dedup or re-aggregate upstream.
    Rows with a NULL user, item, or either score are FILTERED (the
    reference's scipy path yields NaN which it skips; a NULL here would
    instead rank first in the windows). And because the C/D pair join
    is O(n²) per user in one partition, a user with more than
    ``max_items`` scored items raises instead of detonating at scale
    (10⁵ items → 5×10⁹ pairs in one task) — truncate to a ranked
    prefix upstream if genuinely huge lists must be compared. The
    guards ride the same eager pass that materializes the checkpointed
    rank frame, so they add no extra scan.

    Returns one row per qualifying user:
    ``(user, n_items, spearman, kendall)``, both coefficients rounded
    to 6dp (sqrt/division are the only non-exact ops; every count and
    rank sum is exact in double at sane list sizes). Macro-average the
    columns for the reference's headline pair. Scale shape: one shuffle
    on ``user`` shared by the windows and aggregations, plus the
    per-user pairwise join — O(Σ per-user n²), bounded by list length
    like every pairwise rank metric (and by ``max_items``), never
    all-users-cross."""
    from pyspark.sql import Window

    u, it = F.col(user), F.col(item)
    p, t = F.col(pred), F.col(true)
    scored = scored.where(
        u.isNotNull() & it.isNotNull() & p.isNotNull() & t.isNotNull()
    )
    avg_rank_p = (
        F.rank().over(Window.partitionBy(user).orderBy(pred))
        + (F.count("*").over(Window.partitionBy(user, pred)) - 1) / 2
    )
    avg_rank_t = (
        F.rank().over(Window.partitionBy(user).orderBy(true))
        + (F.count("*").over(Window.partitionBy(user, true)) - 1) / 2
    )
    ranked = scored.select(
        u.alias("__u"), it.alias("__i"), p.alias("__p"), t.alias("__t"),
        avg_rank_p.alias("__rx"), avg_rank_t.alias("__ry"),
    )
    # five consumers read the ranked frame (moment agg, the i<j self-join's
    # two sides, both tie terms) — lazily checkpoint it so the input joins
    # and the four rank windows execute once (the apply_topk_delta
    # collapse-reuse pattern; the frame is input-sized, one row per scored
    # pair)
    ranked = ranked.localCheckpoint(eager=False)
    # eager guard pass (labelqc's loud-ValueError pattern) — doubles as
    # the checkpoint materialization the five consumers reuse
    gstats = (
        ranked.groupBy("__u")
        .agg(F.count("*").alias("__n"), F.countDistinct("__i").alias("__nd"))
        .agg(
            F.max("__n").alias("mx"),
            F.sum(F.col("__n") - F.col("__nd")).alias("dups"),
        )
        .collect()[0]
    )
    if gstats["dups"]:
        raise ValueError(
            f"ranking_correlation: {gstats['dups']} duplicate "
            f"({user}, {item}) rows — duplicates silently skew the "
            "coefficients (excluded from Kendall's pair join, counted in "
            "Spearman's n); dedup or re-aggregate the scores upstream"
        )
    if gstats["mx"] is not None and gstats["mx"] > max_items:
        raise ValueError(
            f"ranking_correlation: a user has {gstats['mx']} scored items "
            f"(> max_items={max_items}) — the per-user i<j pair join is "
            "O(n²) in one partition; truncate to a ranked prefix upstream "
            "or raise max_items deliberately"
        )
    rx, ry = F.col("__rx"), F.col("__ry")
    base = ranked.groupBy("__u").agg(
        F.count("*").alias("n_items"),
        F.sum(rx).alias("__sx"),
        F.sum(ry).alias("__sy"),
        F.sum(rx * rx).alias("__sxx"),
        F.sum(ry * ry).alias("__syy"),
        F.sum(rx * ry).alias("__sxy"),
    ).where(F.col("n_items") >= min_items)
    n = F.col("n_items")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    spearman = F.when(
        (vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6)
    )

    # Kendall: concordant/discordant from the within-user i<j pair join
    a = ranked.select(
        F.col("__u"), F.col("__i").alias("__ia"),
        F.col("__p").alias("__pa"), F.col("__t").alias("__ta"),
    )
    b = ranked.select(
        F.col("__u"), F.col("__i").alias("__ib"),
        F.col("__p").alias("__pb"), F.col("__t").alias("__tb"),
    )
    sgn = (
        F.signum(F.col("__pa") - F.col("__pb"))
        * F.signum(F.col("__ta") - F.col("__tb"))
    )
    cd = (
        a.join(b, ["__u"])
        .where(F.col("__ia") < F.col("__ib"))
        .groupBy("__u")
        .agg(
            F.count(F.when(sgn > 0, 1)).alias("__c"),
            F.count(F.when(sgn < 0, 1)).alias("__d"),
        )
    )
    tie_terms = []
    for col, alias in (("__p", "__n1"), ("__t", "__n2")):
        tie_terms.append(
            ranked.groupBy("__u", col)
            .agg(F.count("*").alias("__g"))
            .groupBy("__u")
            .agg(
                F.sum(F.col("__g") * (F.col("__g") - 1) / 2).alias(alias)
            )
        )
    n0 = n * (n - 1) / 2
    denom = (n0 - F.col("__n1")) * (n0 - F.col("__n2"))
    kendall = F.when(
        denom > 0,
        F.round(
            (F.coalesce(F.col("__c"), F.lit(0)) - F.coalesce(F.col("__d"), F.lit(0)))
            / F.sqrt(denom),
            6,
        ),
    )
    return (
        base.join(tie_terms[0], "__u")
        .join(tie_terms[1], "__u")
        .join(cd, "__u", "left")
        .select(
            F.col("__u").alias(user),
            "n_items",
            spearman.alias("spearman"),
            kendall.alias("kendall"),
        )
    )


def ranking_auc(
    scored: DataFrame,
    user: str = "user_idx",
    pred: str = "pred_score",
    label: str = "label",
    min_pos: int = 1,
    min_neg: int = 1,
) -> DataFrame:
    """Per-user ROC-AUC in the Mann-Whitney rank form — the probability
    that a random positive outranks a random negative under ``pred``:

        AUC = (Σ_{positives} avg_rank − P(P+1)/2) / (P · N)

    with scipy-style AVERAGE ranks over the user's full list (tied
    scores share rank mass; a user whose scores are all tied lands at
    exactly 0.5), the same two shared-partition windows as
    ``ranking_correlation``'s Spearman. ``label`` must be boolean-like
    (cast to int 0/1; NULL label or NULL score rows are filtered —
    they belong to neither class). Users with fewer than ``min_pos``
    positives or ``min_neg`` negatives are skipped (AUC is undefined
    on a one-class list — the reference's skip-NaN discipline).

    Returns ``(user, n_pos, n_neg, auc)`` with ``auc`` rounded to 6dp;
    macro-average the column for the headline number. Scale shape: one
    shuffle on ``user`` shared by the rank windows and the final
    aggregate — rank arithmetic only, NO pairwise join (the closed
    form is why AUC scales where naive positive×negative pair
    counting is O(P·N) per user)."""
    from pyspark.sql import Window

    u = F.col(user)
    p = F.col(pred)
    y = F.col(label).cast("int")
    rows = scored.where(u.isNotNull() & p.isNotNull() & y.isNotNull()).select(
        u.alias("__u"), p.alias("__p"), y.alias("__y")
    )
    avg_rank = (
        F.rank().over(Window.partitionBy("__u").orderBy("__p"))
        + (F.count("*").over(Window.partitionBy("__u", "__p")) - 1) / 2
    )
    ranked = rows.select("__u", "__y", avg_rank.alias("__r"))
    agg = ranked.groupBy("__u").agg(
        F.sum("__y").alias("n_pos"),
        F.sum(1 - F.col("__y")).alias("n_neg"),
        F.sum(F.when(F.col("__y") == 1, F.col("__r"))).alias("__rp"),
    )
    P, N = F.col("n_pos"), F.col("n_neg")
    return (
        agg.where((P >= min_pos) & (N >= min_neg))
        .select(
            F.col("__u").alias(user),
            "n_pos",
            "n_neg",
            F.round(
                (F.col("__rp") - P * (P + 1) / 2) / (P * N), 6
            ).alias("auc"),
        )
    )


def ranking_correlation_pandas(
    scored: DataFrame,
    user: str = "user_idx",
    item: str = "item_idx",
    pred: str = "pred_score",
    true: str = "true_score",
    min_items: int = 3,
) -> DataFrame:
    """Grouped-kernel twin of ``ranking_correlation`` for HUGE per-user
    lists: Kendall tau-b via Knight's O(n log n) algorithm (sort by
    (pred, true), count strict inversions of true with a Fenwick tree —
    C − D = n0 − n1 − n2 + n3 − 2·inversions) and Spearman via
    average-rank Pearson, one ``applyInPandas`` kernel per user. Where
    the expression form's i<j pair join is O(n²) per user (hence its
    ``max_items`` gate), this kernel is O(n log n) with NO pair
    materialization — the scale path when a user's list genuinely has
    10⁵+ scored items. Same input contract (unique (user, item);
    NULL-score rows filtered here) and the same skip rules; outputs
    full-precision doubles (the expression form rounds to 6dp — tests
    assert agreement within 6e-7, the rounding radius).

    The expression form stays the default: it needs no Python in the
    data path and its per-user cost is fine at ranked-list sizes. This
    twin documents and tests the algorithmic escape hatch, the same
    pattern as ``per_user_metrics_pandas``."""
    import numpy as np
    import pandas as pd

    user_type = scored.schema[user].dataType.simpleString()
    out_schema = (
        f"{user} {user_type}, n_items long, spearman double, kendall double"
    )

    def _inversions(vals: "np.ndarray") -> int:
        # Fenwick tree over rank-compressed values: for each element in
        # sequence order, count previously-seen STRICTLY GREATER values.
        ranks = np.searchsorted(np.unique(vals), vals) + 1
        m = int(ranks.max())
        tree = [0] * (m + 1)
        inv = 0
        seen = 0
        for r in ranks:
            i = int(r)
            s = 0  # previously seen with rank <= r
            while i > 0:
                s += tree[i]
                i -= i & (-i)
            inv += seen - s
            i = int(r)
            while i <= m:
                tree[i] += 1
                i += i & (-i)
            seen += 1
        return inv

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=[pred, true])
        n = len(pdf)
        key = pdf[user].iloc[0] if n else None
        if n < min_items:
            return pd.DataFrame(
                columns=[user, "n_items", "spearman", "kendall"]
            )
        x = pdf[pred].to_numpy(dtype=np.float64)
        y = pdf[true].to_numpy(dtype=np.float64)
        # Spearman: Pearson over average ranks
        rx = pd.Series(x).rank(method="average").to_numpy()
        ry = pd.Series(y).rank(method="average").to_numpy()
        vx = ((rx - rx.mean()) ** 2).sum()
        vy = ((ry - ry.mean()) ** 2).sum()
        if vx > 0 and vy > 0:
            sp = float(((rx - rx.mean()) * (ry - ry.mean())).sum() / np.sqrt(vx * vy))
        else:
            sp = None
        # Kendall tau-b via Knight: sort by (x, y), count y-inversions
        order = np.lexsort((y, x))
        ys = y[order]
        n0 = n * (n - 1) // 2
        _, cx = np.unique(x, return_counts=True)
        n1 = int((cx * (cx - 1) // 2).sum())
        _, cy = np.unique(y, return_counts=True)
        n2 = int((cy * (cy - 1) // 2).sum())
        xy = pdf[[pred, true]].value_counts().to_numpy()
        n3 = int((xy * (xy - 1) // 2).sum())
        c_minus_d = n0 - n1 - n2 + n3 - 2 * _inversions(ys)
        denom = (n0 - n1) * (n0 - n2)
        kt = float(c_minus_d / np.sqrt(denom)) if denom > 0 else None
        return pd.DataFrame(
            [{user: key, "n_items": n, "spearman": sp, "kendall": kt}]
        )

    rows = scored.select(user, item, pred, true).where(
        F.col(user).isNotNull() & F.col(item).isNotNull()
    )
    return rows.groupBy(user).applyInPandas(fn, out_schema)
