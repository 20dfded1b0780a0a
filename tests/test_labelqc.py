"""Label-quality operators (operators/labelqc.py) — planted-mislabel
detection on a constructed clustered dataset (the testdata embeddings'
labels are random w.r.t. geometry, chance-level 10% neighbor agreement,
so they exercise the oracles but can't demonstrate detection), plus the
brute==ivf equivalence and the loud high-cardinality guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.operators.labelqc import (
    knn_label_vote,
    label_centroid_margin,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """Three tight clusters on orthogonal axes, 6 points each; row 99
    carries label 1 but sits in cluster 0 — the planted mislabel."""
    rows = []
    axes = {0: [1.0, 0.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0, 0.0], 2: [0.0, 0.0, 1.0, 0.0]}
    rid = 0
    for lbl, ax in axes.items():
        for j in range(6):
            jit = 0.01 * (j + 1)
            vec = [c + (jit if i == 3 else 0.0) for i, c in enumerate(ax)]
            rows.append((rid, lbl, vec))
            rid += 1
    rows.append((99, 1, [1.0, 0.0, 0.0, 0.05]))  # looks like cluster 0
    return spark.createDataFrame(rows, "id long, label int, vec array<double>")


def test_knn_vote_flags_planted_mislabel(clustered):
    out = knn_label_vote(clustered, "id", "label", vec_col="vec", k=3).collect()
    by_id = {r["id"]: r for r in out}
    planted = by_id[99]
    assert planted["voted_label"] == 0
    assert planted["is_suspect"] == 1
    assert planted["n_agree"] == 0
    # every clean row keeps its label; the planted point sits inside
    # cluster 0, so it MAY occupy one neighbor slot there (n_agree 2)
    clean = [r for r in out if r["id"] != 99]
    assert clean and all(r["is_suspect"] == 0 and r["n_agree"] >= 2 for r in clean)


def test_centroid_margin_flags_planted_mislabel(clustered):
    out = label_centroid_margin(clustered, "id", "label", vec_col="vec").collect()
    by_id = {r["id"]: r for r in out}
    planted = by_id[99]
    assert planted["margin"] < 0 and planted["is_suspect"] == 1
    assert planted["best_other_label"] == 0
    clean = [r for r in out if r["id"] != 99]
    # the planted point drags label 1's centroid, but every clean point
    # still sits closest to its own class center
    assert clean and all(r["margin"] > 0 and r["is_suspect"] == 0 for r in clean)


def test_ivf_probe_all_equals_brute(spark):
    """With n_probe == n_cells the IVF path degenerates to exhaustive
    search, so the vote must equal the brute kernel's exactly — the same
    frozen-build determinism contract as the ANN tier."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    brute = sorted(map(tuple, knn_label_vote(emb, "vec_id", "label", k=5).collect()))
    ivf = sorted(
        map(
            tuple,
            knn_label_vote(
                emb, "vec_id", "label", k=5, method="ivf", n_cells=8, n_probe=8
            ).collect(),
        )
    )
    assert ivf == brute


def test_centroid_margin_rejects_high_cardinality_label(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="distinct labels exceeds"):
        # vec_id as the "label": one label per row, way over the cap
        label_centroid_margin(emb, "vec_id", "vec_id", max_labels=50)


def test_string_labels_tiebreak_label_asc(spark):
    """String class labels (legal: the API never restricts the type) must
    vote with the documented (count desc, label asc) tie-break — the old
    unary-negation trick threw under ANSI mode / NULL-flipped the order
    under legacy (r11 ADVICE)."""
    # Query point 0 sits equidistant from one "apple" and one "banana"
    # neighbor: a 1-1 vote, so label asc must pick "apple".
    rows = [
        (0, "banana", [1.0, 0.0, 0.0]),
        (1, "apple", [0.9, 0.1, 0.0]),
        (2, "banana", [0.9, -0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "id long, label string, vec array<double>")
    out = knn_label_vote(df, "id", "label", vec_col="vec", k=2).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[0]["voted_label"] == "apple"
    assert by_id[0]["is_suspect"] == 1

    marg = label_centroid_margin(df, "id", "label", vec_col="vec").collect()
    assert {r["label"] for r in marg} == {"apple", "banana"}
    assert all(r["best_other_label"] in ("apple", "banana") for r in marg)


def test_singleton_labels_survive_with_null_vote(spark):
    """A one-row corpus has zero neighbors; the row must still appear
    (voted_label NULL, n_agree 0, is_suspect 0) instead of silently
    vanishing from per-class suspect rates (r11 ADVICE)."""
    df = spark.createDataFrame(
        [(7, 3, [1.0, 0.0])], "id long, label int, vec array<double>"
    )
    out = knn_label_vote(df, "id", "label", vec_col="vec", k=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["id"] == 7 and r["label"] == 3
    assert r["voted_label"] is None
    assert r["n_agree"] == 0 and r["is_suspect"] == 0


def test_unknown_method_fails_loudly(clustered):
    with pytest.raises(ValueError, match="unknown method"):
        knn_label_vote(clustered, "id", "label", vec_col="vec", method="cosine")


def test_hostile_identifiers(clustered):
    """Dotted/spaced column names (flattened-JSON / CSV-header reality at
    a 100 TB lake) must resolve as single identifiers via ident.qcol."""
    hostile = (
        clustered.withColumnRenamed("id", "row.id")
        .withColumnRenamed("label", "class label")
        .withColumnRenamed("vec", "emb.vec")
    )
    vote = knn_label_vote(hostile, "row.id", "class label", vec_col="emb.vec", k=3)
    assert vote.columns[:2] == ["row.id", "class label"]
    by_id = {r["row.id"]: r for r in vote.collect()}
    assert by_id[99]["is_suspect"] == 1

    marg = label_centroid_margin(hostile, "row.id", "class label", vec_col="emb.vec")
    by_id = {r["row.id"]: r for r in marg.collect()}
    assert by_id[99]["is_suspect"] == 1
