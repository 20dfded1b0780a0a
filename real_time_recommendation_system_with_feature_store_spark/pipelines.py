"""End-to-end batch training-data pipeline — the reference's §3.1 lifecycle
(`scripts/train_movielens.py` -> `src/data/movielens.py:263-343`) as ONE lazy
DataFrame DAG: scan -> derive -> k-core -> label -> encode -> split.

The reference materializes pandas frames at every stage; here nothing
executes until the caller acts, so Catalyst sees the whole pipeline and
prunes/pushes across stage boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.functions import scalars
from real_time_recommendation_system_with_feature_store_spark.operators.encode import label_encode
from real_time_recommendation_system_with_feature_store_spark.operators.kcore import kcore_filter
from real_time_recommendation_system_with_feature_store_spark.operators.split import time_fraction_split
from real_time_recommendation_system_with_feature_store_spark.sources.readers import read_delimited
from real_time_recommendation_system_with_feature_store_spark.sources.schemas import schema_for

# Age/occupation code maps (reference src/data/movielens.py:47-59)
AGE_MAP = {1: "Under 18", 18: "18-24", 25: "25-34", 35: "35-44", 45: "45-49", 50: "50-55", 56: "56+"}
OCCUPATION_MAP = {
    0: "other", 1: "academic/educator", 2: "artist", 3: "clerical/admin",
    4: "college/grad student", 5: "customer service", 6: "doctor/health care",
    7: "executive/managerial", 8: "farmer", 9: "homemaker", 10: "K-12 student",
    11: "lawyer", 12: "programmer", 13: "retired", 14: "sales/marketing",
    15: "scientist", 16: "self-employed", 17: "technician/engineer",
    18: "tradesman/craftsman", 19: "unemployed", 20: "writer",
}
GENRES = [
    "Action", "Adventure", "Animation", "Children's", "Comedy", "Crime",
    "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "Musical",
    "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western",
]


@dataclass
class InteractionData:
    """Mirror of the reference's MovieLensData bundle (movielens.py:19-41)."""

    interactions: DataFrame  # with label + split + encoded ids
    users: DataFrame
    items: DataFrame


def load_ratings(spark: SparkSession, path: str) -> DataFrame:
    """S1 + F7: `::`-separated ratings with derived event timestamp
    (reference movielens.py:85-104)."""
    df = read_delimited(spark, path, schema_for("ratings"))
    return df.withColumn("datetime", scalars.unix_to_timestamp(F.col("timestamp")))


def load_users(spark: SparkSession, path: str) -> DataFrame:
    """Users dim + derived gender_encoded / age_group / occupation_name
    (reference movielens.py:106-127)."""
    df = read_delimited(spark, path, schema_for("users"))
    return (
        df.withColumn("gender_encoded", scalars.equality_encode(F.col("gender"), "M"))
        .withColumn("age_group", scalars.map_lookup(F.col("age"), AGE_MAP, default="unknown"))
        .withColumn(
            "occupation_name", scalars.map_lookup(F.col("occupation"), OCCUPATION_MAP, default="other")
        )
    )


def load_movies(spark: SparkSession, path: str, genres: list[str] | None = None) -> DataFrame:
    """Movies dim + year extraction, title cleanup, genre multi-hot, genre
    count (reference movielens.py:129-160).

    Multi-hot uses case-insensitive SUBSTRING matching exactly like the
    reference's str.contains(case=False, regex=False) — "War" also hits
    "Warhol"; replicated for parity, not fixed.
    """
    df = read_delimited(spark, path, schema_for("movies"))
    out = (
        df.withColumn("year", scalars.extract_year(F.col("title")))
        .withColumn("title_clean", scalars.strip_year(F.col("title")))
        .withColumn("num_genres", scalars.num_genres(F.col("genres")))
    )
    for g in genres or GENRES:
        col_name = "genre_" + g.lower().replace("'", "").replace("-", "_")
        out = out.withColumn(col_name, scalars.genre_flag(F.col("genres"), g))
    return out


def build_training_data(
    ratings: DataFrame,
    users: DataFrame,
    movies: DataFrame,
    rating_threshold: float = 4.0,
    min_user: int = 5,
    min_item: int = 5,
    kcore_iterations: int = 3,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> InteractionData:
    """Stages 2-6 of the reference lifecycle (§3.1) as one lazy DAG:

    k-core filter (A12) -> implicit label (P3) -> dense id encoding (F19)
    -> time split (O1/O3) -> dim filtering (P5 via semi join).
    """
    filtered = kcore_filter(
        ratings, "user_id", "movie_id", min_user, min_item, kcore_iterations
    )
    labeled = filtered.withColumn(
        "label", (F.col("rating") >= F.lit(rating_threshold)).cast("int")
    )
    encoded = label_encode(label_encode(labeled, "user_id"), "movie_id")
    split = time_fraction_split(
        encoded, ["timestamp", "user_id", "movie_id"], train_frac, val_frac
    )
    # the distinct key sets are data-dependent (user/item cardinality, not
    # a fixed dim): stats-gate the broadcast hint on the sanely-estimated
    # pre-distinct projection so a billion-entity catalog falls back to a
    # shuffled semi join instead of an executor OOM
    from real_time_recommendation_system_with_feature_store_spark.plans.inspect import gated_broadcast

    users_kept = users.join(
        gated_broadcast(
            split.select("user_id").distinct(), gate_df=split.select("user_id")
        ),
        "user_id",
        "left_semi",
    )
    movies_kept = movies.join(
        gated_broadcast(
            split.select("movie_id").distinct(), gate_df=split.select("movie_id")
        ),
        "movie_id",
        "left_semi",
    )
    return InteractionData(interactions=split, users=users_kept, items=movies_kept)
