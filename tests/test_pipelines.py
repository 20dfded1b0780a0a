"""Loader + end-to-end pipeline tests on tiny synthetic `.dat` files — the
reference's own loader-test pattern (tests/test_data_loading.py:32-47)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "dat")


@pytest.fixture(scope="module")
def dat_files():
    os.makedirs(TMP, exist_ok=True)
    with open(f"{TMP}/ratings.dat", "w", encoding="latin-1") as f:
        # user::movie::rating::ts — users 1,2 x movies 1,2,3
        rows = [
            (1, 1, 5, 100), (1, 2, 3, 200), (1, 3, 4, 300),
            (2, 1, 4, 150), (2, 2, 2, 250), (2, 3, 5, 350),
        ]
        f.write("\n".join("::".join(map(str, r)) for r in rows))
    with open(f"{TMP}/users.dat", "w", encoding="latin-1") as f:
        f.write("1::F::25::12::55455\n2::M::56::3::00000")
    with open(f"{TMP}/movies.dat", "w", encoding="latin-1") as f:
        f.write(
            "1::Toy Story (1995)::Animation|Children's|Comedy\n"
            "2::Heat (1995)::Action|Crime|Thriller\n"
            "3::No Year::Drama"
        )
    return TMP


def test_load_ratings(spark, dat_files):
    from real_time_recommendation_system_with_feature_store_spark.pipelines import load_ratings

    df = load_ratings(spark, f"{dat_files}/ratings.dat")
    assert df.count() == 6
    row = df.where((F.col("user_id") == 1) & (F.col("movie_id") == 1)).collect()[0]
    assert row["rating"] == 5
    assert row["datetime"].isoformat().startswith("1970-01-01 00:01:40"[:10])


def test_load_users_derivations(spark, dat_files):
    from real_time_recommendation_system_with_feature_store_spark.pipelines import load_users

    rows = {r["user_id"]: r for r in load_users(spark, f"{dat_files}/users.dat").collect()}
    assert rows[1]["gender_encoded"] == 0 and rows[2]["gender_encoded"] == 1
    assert rows[1]["age_group"] == "25-34" and rows[2]["age_group"] == "56+"
    assert rows[1]["occupation_name"] == "programmer"


def test_load_movies_multihot(spark, dat_files):
    from real_time_recommendation_system_with_feature_store_spark.pipelines import load_movies

    rows = {r["movie_id"]: r for r in load_movies(spark, f"{dat_files}/movies.dat").collect()}
    assert rows[1]["year"] == 1995 and rows[1]["title_clean"] == "Toy Story"
    assert rows[3]["year"] == 1990  # default when no (yyyy)
    assert rows[1]["genre_childrens"] == 1 and rows[1]["genre_animation"] == 1
    assert rows[2]["genre_action"] == 1 and rows[2]["genre_comedy"] == 0
    assert rows[1]["num_genres"] == 3


def test_build_training_data_end_to_end(spark, dat_files):
    from real_time_recommendation_system_with_feature_store_spark.pipelines import (
        build_training_data,
        load_movies,
        load_ratings,
        load_users,
    )

    data = build_training_data(
        load_ratings(spark, f"{dat_files}/ratings.dat"),
        load_users(spark, f"{dat_files}/users.dat"),
        load_movies(spark, f"{dat_files}/movies.dat"),
        min_user=1, min_item=1, kcore_iterations=1,
        train_frac=0.5, val_frac=0.25,
    )
    inter = data.interactions.collect()
    assert len(inter) == 6
    # implicit labels: rating >= 4 -> 1 (reference movielens.py:256)
    labels = {(r["user_id"], r["movie_id"]): r["label"] for r in inter}
    assert labels[(1, 1)] == 1 and labels[(1, 2)] == 0
    # dense encodings present + 0-based
    assert {r["user_id_idx"] for r in inter} == {0, 1}
    assert {r["movie_id_idx"] for r in inter} == {0, 1, 2}
    # split proportions: int(6*.5)=3 train, int(6*.75)=4 -> 1 val, 2 test
    from collections import Counter

    counts = Counter(r["split"] for r in inter)
    assert counts == {"train": 3, "val": 1, "test": 2}
    # temporal ordering property (reference test_data_loading.py:125-142)
    max_train = max(r["timestamp"] for r in inter if r["split"] == "train")
    min_test = min(r["timestamp"] for r in inter if r["split"] == "test")
    assert max_train <= min_test
    assert data.users.count() == 2 and data.items.count() == 3


ML1M = "/root/reference/ml-1m"


@pytest.mark.skipif(not os.path.exists(f"{ML1M}/users.dat"), reason="ml-1m data not present")
def test_real_ml1m_dims_parity(spark):
    """Loader parity against the REAL MovieLens-1M dimension files shipped with
    the reference (ratings.dat is not distributed there): published counts are
    6,040 users and 3,883 movies (reference results/EVALUATION_REPORT.md:42,
    ml-1m/README)."""
    from real_time_recommendation_system_with_feature_store_spark.pipelines import load_movies, load_users

    users = load_users(spark, f"{ML1M}/users.dat")
    assert users.count() == 6040
    # derivations hold on real data: encodes are total, age buckets legal
    assert users.where(F.col("gender_encoded").isin(0, 1)).count() == 6040
    assert users.where(F.col("age_group").isNull()).count() == 0

    movies = load_movies(spark, f"{ML1M}/movies.dat")
    assert movies.count() == 3883
    # year extraction: every title carries "(yyyy)" in the real file
    years = movies.agg(F.min("year").alias("lo"), F.max("year").alias("hi")).collect()[0]
    assert 1919 <= years["lo"] and years["hi"] <= 2000
    # latin-1 round-trip: the file has accented titles
    assert movies.where(F.col("title").contains("Misérables")).count() >= 1
    # genre multi-hot columns populated and consistent with num_genres
    mh = movies.select(
        (sum(F.col(c) for c in movies.columns if c.startswith("genre_")) > 0).alias("any")
    )
    assert mh.where(~F.col("any")).count() == 0
