"""Round-9 additions: DSIR Gumbel-top-k importance resampling.

The paper's selection step (Xie et al. 2023 §2) SAMPLES by importance
weight rather than ranking deterministically — Gumbel-top-k over the
log-ratios draws k docs without replacement with P ∝ exp(score). These
tests pin the three properties that make it correct and shippable:
share recovery (the sample hits the importance-weighted mixture),
determinism under the seeded md5 uniforms, and temperature limits.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _two_group_scores(spark, n_per_group=2000, hi=math.log(3.0)):
    """Group A (ids 0..n-1) carries log-weight ln 3, group B weight 0 —
    importance-weighted share of A = 3/(3+1) = 0.75 exactly."""
    a = spark.range(n_per_group).select(
        F.col("id").alias("doc_id"), F.lit(hi).alias("logratio"), F.lit("A").alias("grp")
    )
    b = spark.range(n_per_group, 2 * n_per_group).select(
        F.col("id").alias("doc_id"), F.lit(0.0).alias("logratio"), F.lit("B").alias("grp")
    )
    return a.unionByName(b)


def test_dsir_resample_recovers_importance_shares(spark):
    """k=400 of 4000 docs where A's weight is 3x B's: A's expected sample
    share is 0.75 (sampling fraction 10%, so the without-replacement
    depletion correction is negligible); binomial σ ≈ 0.022, assert ±3σ.
    Plain top-k would return 100% A — the failure mode resampling exists
    to avoid — so also assert B is genuinely represented."""
    from real_time_recommendation_system_with_feature_store_spark.operators.corpus import dsir_resample

    scores = _two_group_scores(spark)
    picked = dsir_resample(scores, "doc_id", "logratio", k=400, salt="share")
    rows = picked.collect()
    assert len(rows) == 400
    share_a = sum(1 for r in rows if r["grp"] == "A") / 400.0
    assert abs(share_a - 0.75) < 0.07, share_a
    assert any(r["grp"] == "B" for r in rows)
    # ranks are 1..k in sel_key-desc order
    by_rank = sorted(rows, key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == list(range(1, 401))
    keys = [r["sel_key"] for r in by_rank]
    assert keys == sorted(keys, reverse=True)


def test_dsir_resample_deterministic_and_salt_sensitive(spark):
    """Same salt → bit-identical selection under different partitioning;
    different salt → a different draw whose share still lands in band
    (seeded randomness, not a disguised constant)."""
    from real_time_recommendation_system_with_feature_store_spark.operators.corpus import dsir_resample

    scores = _two_group_scores(spark)
    first = {r["doc_id"] for r in dsir_resample(scores, "doc_id", "logratio", 400, salt="s1").collect()}
    again = {
        r["doc_id"]
        for r in dsir_resample(
            scores.repartition(7, "doc_id"), "doc_id", "logratio", 400, salt="s1"
        ).collect()
    }
    assert first == again
    other = {r["doc_id"] for r in dsir_resample(scores, "doc_id", "logratio", 400, salt="s2").collect()}
    assert first != other
    rows = dsir_resample(scores, "doc_id", "logratio", 400, salt="s2").collect()
    share_a = sum(1 for r in rows if r["grp"] == "A") / 400.0
    assert abs(share_a - 0.75) < 0.07, share_a


def test_dsir_resample_temperature_limits(spark):
    """T→0 sharpens to deterministic top-k by score (every pick from the
    high-weight group: the score gap / T ≈ 22 dwarfs any Gumbel draw at
    this fixture size); large T flattens toward uniform (A's share falls
    from 0.75 toward 0.5)."""
    from real_time_recommendation_system_with_feature_store_spark.operators.corpus import dsir_resample

    scores = _two_group_scores(spark)
    cold = dsir_resample(scores, "doc_id", "logratio", 200, salt="t", temperature=0.05)
    assert all(r["grp"] == "A" for r in cold.collect())
    hot = dsir_resample(scores, "doc_id", "logratio", 400, salt="t", temperature=50.0)
    share_a = sum(1 for r in hot.collect() if r["grp"] == "A") / 400.0
    assert abs(share_a - 0.5) < 0.07, share_a


def test_dsir_resample_validation_and_plan(spark):
    from real_time_recommendation_system_with_feature_store_spark.operators.corpus import dsir_resample
    from real_time_recommendation_system_with_feature_store_spark.plans.inspect import explain_str

    scores = _two_group_scores(spark, n_per_group=50)
    with pytest.raises(ValueError, match="k must be positive"):
        dsir_resample(scores, "doc_id", "logratio", k=0)
    with pytest.raises(ValueError, match="temperature must be positive"):
        dsir_resample(scores, "doc_id", "logratio", k=5, temperature=0.0)
    # selection is per-partition heaps + driver merge, never a global sort
    plan = explain_str(dsir_resample(scores, "doc_id", "logratio", k=5))
    assert "TakeOrderedAndProject" in plan
