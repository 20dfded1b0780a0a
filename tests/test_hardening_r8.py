"""Round-8 hardening tests: guard rails added on the r7 VERDICT/ADVICE nits
(negative sketch weights, cms_estimate reserved names, rrf rank uniqueness,
PPR degenerate seeds, pagerank dangling-mass redistribution, HLL small-m
alpha constants, cohort horizon bound, HLL intersection estimate)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ sketch guards

def test_cms_build_rejects_negative_weight_in_plan(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import cms_build

    df = spark.createDataFrame([("a", 2), ("b", -1)], ["k", "w"])
    sk = cms_build(df, F.col("k"), weight=F.col("w"))
    with pytest.raises(Exception, match="negative weight"):
        sk.collect()


def test_cms_build_null_weight_counts_zero(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([("a", 3), ("a", None), ("b", 1)], ["k", "w"])
    sk = cms_build(df, F.col("k"), weight=F.col("w"))
    probe = spark.createDataFrame([("a",), ("b",)], ["k"])
    est = {
        r["k"]: r["est_count"]
        for r in cms_estimate(probe, sk, F.col("k")).collect()
    }
    assert est["a"] == 3 and est["b"] == 1


def test_qsketch_build_rejects_negative_weight_in_plan(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import qsketch_build

    df = spark.createDataFrame([(10.0, 5), (20.0, -2)], ["v", "w"])
    sk = qsketch_build(df, F.col("v"), weight=F.col("w"))
    with pytest.raises(Exception, match="negative weight"):
        sk.collect()


def test_cms_estimate_rejects_reserved_probe_columns(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([("a",)], ["k"])
    sk = cms_build(df, F.col("k"))
    probe = spark.createDataFrame([("a", 9)], ["k", "__b2"])
    with pytest.raises(ValueError, match="reserved internal"):
        cms_estimate(probe, sk, F.col("k"))


# --------------------------------------------------------- HLL small-m alpha

def test_hll_alpha_uses_paper_constants_below_m128():
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import _hll_alpha

    assert _hll_alpha(16) == 0.673
    assert _hll_alpha(32) == 0.697
    assert _hll_alpha(64) == 0.709
    assert _hll_alpha(256) == 0.7213 / (1.0 + 1.079 / 256)


def test_hll_estimate_small_p_reasonable(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import hll_build, hll_estimate

    n = 5000  # large enough that p=4 (m=16) stays on the raw-estimate path
    df = spark.range(n).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    for p in (4, 5, 6):
        est = hll_estimate(hll_build(df, F.col("k"), p=p), p=p).collect()[0][
            "est_distinct"
        ]
        sigma = 1.04 / (2 ** (p / 2))
        assert abs(est - n) <= 4 * sigma * n, (p, est)


# ------------------------------------------------------- HLL intersection

def test_hll_intersect_estimate_within_3_sigma(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import (
        hll_build,
        hll_intersect_estimate,
    )

    # |A| = 3000, |B| = 3000, |A ∩ B| = 1000 (ids 2000..2999)
    a = spark.range(0, 3000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    b = spark.range(2000, 5000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    p = 10
    out = hll_intersect_estimate(
        hll_build(a, F.col("k"), p=p), hll_build(b, F.col("k"), p=p), p=p
    ).collect()[0]
    sigma = 1.04 / (2 ** (p / 2))
    # inclusion-exclusion error is bounded by the three estimates' errors
    bound = 3 * sigma * (out["est_a"] + out["est_b"] + out["est_union"])
    assert abs(out["est_intersect"] - 1000) <= bound, dict(out.asDict())
    assert abs(out["est_a"] - 3000) <= 3 * sigma * 3000
    assert abs(out["est_union"] - 5000) <= 3 * sigma * 5000


def test_hll_intersect_estimate_grouped_and_clamped(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.sketches import (
        hll_build,
        hll_intersect_estimate,
    )

    rows = [("g1", f"x{i}") for i in range(200)] + [("g2", f"y{i}") for i in range(200)]
    a = spark.createDataFrame(rows, ["g", "k"])
    # g1 overlaps 200/200 with A; g2 is fully disjoint from A
    rows_b = [("g1", f"x{i}") for i in range(200)] + [
        ("g2", f"z{i}") for i in range(200)
    ]
    b = spark.createDataFrame(rows_b, ["g", "k"])
    out = {
        r["g"]: r
        for r in hll_intersect_estimate(
            hll_build(a, F.col("k"), p=12, by=["g"]),
            hll_build(b, F.col("k"), p=12, by=["g"]),
            p=12,
            by=["g"],
        ).collect()
    }
    assert out["g1"]["est_intersect"] == pytest.approx(200, rel=0.15)
    # disjoint: clamped at 0, never negative
    assert out["g2"]["est_intersect"] >= 0.0
    assert out["g2"]["est_intersect"] == pytest.approx(0.0, abs=0.1 * 400)


# ------------------------------------------------------------ rrf strict

def test_rrf_fuse_strict_rejects_duplicate_entity_in_one_list(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.fuse import rrf_fuse

    good = spark.createDataFrame([(1, 1), (2, 2)], ["item", "rank"])
    dup = spark.createDataFrame([(1, 1), (1, 3)], ["item", "rank"])
    fused = rrf_fuse([good, dup], on=["item"], strict=True)
    with pytest.raises(Exception, match="duplicate entity"):
        fused.collect()
    # the same frames fuse fine unchecked (documenting the double-count
    # hazard strict= exists to catch)
    assert rrf_fuse([good, dup], on=["item"]).count() == 2


def test_rrf_fuse_strict_matches_default_on_clean_lists(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.fuse import rrf_fuse

    l1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["item", "rank"])
    l2 = spark.createDataFrame([(2, 1), (3, 2)], ["item", "rank"])
    loose = {tuple(r) for r in rrf_fuse([l1, l2], on=["item"]).collect()}
    strict = {tuple(r) for r in rrf_fuse([l1, l2], on=["item"], strict=True).collect()}
    assert loose == strict


# ------------------------------------------------------------- graph guards

def test_ppr_raises_on_seeds_outside_graph(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    outside = spark.createDataFrame([(99, 1.0)], ["node", "weight"])
    with pytest.raises(ValueError, match="strictly positive total"):
        pagerank(edges, reset=outside)


def test_ppr_raises_on_zero_and_null_seed_weights(spark):
    from pyspark.sql import types as T

    from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    zero = spark.createDataFrame([(1, 0.0), (2, 0.0)], ["node", "weight"])
    with pytest.raises(ValueError, match="strictly positive total"):
        pagerank(edges, reset=zero)
    schema = T.StructType(
        [T.StructField("node", T.LongType()), T.StructField("weight", T.DoubleType())]
    )
    nulls = spark.createDataFrame([(1, None), (2, None)], schema)
    with pytest.raises(ValueError, match="strictly positive total"):
        pagerank(edges, reset=nulls)


def test_pagerank_dangling_redistribution_conserves_mass(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank

    # node 3 is dangling (no out-edges): default LEAKS, option conserves
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    leak = sum(r["rank"] for r in pagerank(edges, iterations=5).collect())
    assert leak < 0.999  # documented default: mass leaks
    kept = sum(
        r["rank"]
        for r in pagerank(edges, iterations=5, redistribute_dangling=True).collect()
    )
    assert kept == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_option_noop_without_dangling_nodes(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0), (1, 3, 2.0), (3, 1, 1.0), (2, 3, 1.0), (3, 2, 1.0)],
        ["src", "dst", "w"],
    )
    base = {r["node"]: r["rank"] for r in pagerank(edges, "src", "dst", "w").collect()}
    red = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, "src", "dst", "w", redistribute_dangling=True
        ).collect()
    }
    assert base.keys() == red.keys()
    for n in base:
        assert red[n] == pytest.approx(base[n], abs=1e-12)


def test_ppr_dangling_redistribution_uses_seed_teleport(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank

    # dangling node 3; personalized on seed 1 — redistributed mass must
    # follow the seed distribution, keeping total mass 1
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    seeds = spark.createDataFrame([(1, 1.0)], ["node", "weight"])
    ranks = pagerank(
        edges, reset=seeds, iterations=6, redistribute_dangling=True
    ).collect()
    assert sum(r["rank"] for r in ranks) == pytest.approx(1.0, abs=1e-9)


# ------------------------------------------------------------ cohort horizon

def test_cohort_retention_max_offset_truncates_matrix_only(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.cohort import cohort_retention

    rows = []
    for u, days in [(1, [0, 1, 5, 9]), (2, [0, 2]), (3, [1, 3, 8]), (4, [1])]:
        rows += [(u, d) for d in days]
    df = spark.createDataFrame(rows, ["user_id", "d"])
    full = {
        (r["cohort_day"], r["day_offset"]): (r["n_users"], r["retention"])
        for r in cohort_retention(df, "user_id", "d").collect()
    }
    capped = {
        (r["cohort_day"], r["day_offset"]): (r["n_users"], r["retention"])
        for r in cohort_retention(df, "user_id", "d", max_offset=4).collect()
    }
    assert capped == {k: v for k, v in full.items() if k[1] <= 4}
    # offset-0 cells (cohort sizes) are never affected by the horizon cut
    assert all(k in capped for k in full if k[1] == 0)


def test_cohort_retention_rejects_negative_horizon_and_reserved_cols(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.cohort import cohort_retention

    df = spark.createDataFrame([(1, 0)], ["user_id", "d"])
    with pytest.raises(ValueError, match="max_offset"):
        cohort_retention(df, "user_id", "d", max_offset=-1)
    bad = spark.createDataFrame([(1, 0, 0)], ["user_id", "d", "__coh_first"])
    with pytest.raises(ValueError, match="reserved"):
        cohort_retention(bad, "user_id", "d")


# ------------------------------------------------------------ DSIR selection

def test_dsir_logratio_prefers_target_like_docs(spark):
    """Importance log-ratio sanity on a constructed two-domain corpus: an
    UNLABELED doc drawn from the target's character distribution must
    outscore every noise-domain doc, and target-slice docs themselves
    score positive while noise docs score negative."""
    from real_time_recommendation_system_with_feature_store_spark.operators.corpus import dsir_logratio

    target = [(i, "abab baba abba baab abab", 1) for i in range(5)]
    noise = [(10 + i, "xyzq qzyx zzxx qqyy xzxz", 0) for i in range(5)]
    probe = [(99, "abba abab baba baba abab", 0)]  # target-like, unlabeled
    df = spark.createDataFrame(target + noise + probe, ["doc_id", "text", "t"])
    scores = {
        r["doc_id"]: r["logratio"]
        for r in dsir_logratio(df, "text", "doc_id", F.col("t") == 1).collect()
    }
    noise_scores = [scores[10 + i] for i in range(5)]
    assert scores[99] > max(noise_scores)
    assert all(scores[i] > 0 for i in range(5))
    assert all(s < 0 for s in noise_scores)


def test_dsir_selection_recovers_target_domain_at_corpus_scale(spark):
    """On the sf0.001 documents fixture the top quintile by log-ratio must
    be enriched in the target language relative to its base rate — the
    operator's whole point (DSIR top-k selection)."""
    from real_time_recommendation_system_with_feature_store_spark.operators.corpus import dsir_logratio
    from real_time_recommendation_system_with_feature_store_spark.session import load_tables

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load_tables(spark, sf_dir, register=False)["documents"]
    scores = dsir_logratio(d, "text", "doc_id", F.col("lang") == "en")
    joined = scores.join(d.select("doc_id", "lang"), "doc_id")
    rows = sorted(joined.collect(), key=lambda r: (-r["logratio"], r["doc_id"]))
    k = max(len(rows) // 5, 1)
    top_en = sum(1 for r in rows[:k] if r["lang"] == "en") / k
    base_en = sum(1 for r in rows if r["lang"] == "en") / len(rows)
    assert top_en > base_en, (top_en, base_en)
